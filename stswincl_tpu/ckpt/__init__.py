from stswincl_tpu.ckpt.torch_import import (
    import_tswinplus_state_dict,
    import_pixpro_state_dict,
    import_torchvision_resnet18,
)
from stswincl_tpu.ckpt.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_step,
    translate_pretrain_to_seg,
    translate_seg_to_pretrain,
)
