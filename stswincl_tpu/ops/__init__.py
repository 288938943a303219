from stswincl_tpu.ops.window import (
    window_partition,
    window_reverse,
    cyclic_shift,
    relative_position_index,
    shifted_window_attention_mask,
)
from stswincl_tpu.ops.attention import space_time_window_attention
from stswincl_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample_bilinear_align_false,
)
from stswincl_tpu.ops.ohem import ohem_cross_entropy
from stswincl_tpu.ops.contrastive import (
    class_sum_contrastive_loss,
    pixel_pair_stats,
)
