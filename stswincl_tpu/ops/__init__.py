from stswincl_tpu.ops.window import (
    window_partition,
    window_reverse,
    cyclic_shift,
    relative_position_index,
    shifted_window_attention_mask,
)
from stswincl_tpu.ops.attention import space_time_window_attention
from stswincl_tpu.ops.pallas_attention import space_time_window_attention_fused
from stswincl_tpu.ops.pallas_block_attention import (
    windowed_attention_image,
    fused_swin_block_attention,
)
from stswincl_tpu.ops.pallas_add_layernorm import fused_add_layer_norm
from stswincl_tpu.ops.pallas_add_ln_mlp import fused_add_ln_mlp
from stswincl_tpu.ops.pallas_mlp import fused_mlp
from stswincl_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_bilinear_align_corners,
    upsample_bilinear_align_false,
    upsample_argmax,
)
from stswincl_tpu.ops.ohem import (
    ohem_cross_entropy,
    ohem_cross_entropy_channels_first,
    per_pixel_ce_channels_first,
)
from stswincl_tpu.ops.contrastive import (
    class_sum_contrastive_loss,
    pixel_pair_stats,
)
