from stswincl_tpu.models.resnet import ResNet18OS8
from stswincl_tpu.models.swin import (
    SpaceTimeSwinBlock,
    PatchMerging,
    SwinTemporalStack,
)
from stswincl_tpu.models.aspp import ASPP
from stswincl_tpu.models.stswin import TswinPlus, DeepLabV3Plus
from stswincl_tpu.models.pixpro import ContrastEncoder, ProjHead
