from stswincl_tpu.eval.metrics_endovis import (
    dice_score,
    jaccard_score,
    per_class_dice,
    per_class_jaccard,
    EndovisEvaluator,
)
from stswincl_tpu.eval.metrics_cadis import (
    ConfusionMatrix,
    pixel_accuracy,
    pixel_accuracy_per_class,
    mean_iou,
    segmentation_metrics,
)
