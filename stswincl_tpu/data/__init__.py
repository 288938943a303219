from stswincl_tpu.data.endovis18 import EndovisDataset
from stswincl_tpu.data.cadis import CadisDataset, remap_experiment, CADIS_CLASS_NUM
from stswincl_tpu.data.contrastive import ContrastiveClipDataset
from stswincl_tpu.data.loader import Loader, SyntheticSegDataset, SyntheticContrastDataset
from stswincl_tpu.data.rand_augment import (
    RandAugment,
    ClipRandAugment,
    rand_augment_transform,
)
