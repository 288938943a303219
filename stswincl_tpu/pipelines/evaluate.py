"""Evaluation / test driver.

Protocol parity with `seg18/test.py:136-209` (EndoVis: per-frame Dice/IoU at
1024x1280 with per-sequence + per-class breakdown) and
`segcata/cata_test.py:48-175` (CaDIS: split-level confusion-matrix
PA/PAC/mIoU at 540x960). The device side — forward, align-corners upsample,
argmax — is one jitted program (`make_seg_eval_step`); metric accumulation
runs on host over the streamed int predictions.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from stswincl_tpu.configs import SegTrainConfig
from stswincl_tpu.train import make_seg_eval_step
from stswincl_tpu.eval import EndovisEvaluator, ConfusionMatrix
from stswincl_tpu.eval.metrics_cadis import (
    pixel_accuracy, pixel_accuracy_per_class, mean_iou)
from stswincl_tpu.data.cadis import CADIS_CLASS_NUM
from stswincl_tpu.data.loader import _seeded_rng


def evaluate_split(model, params, batch_stats, dataset, cfg: SegTrainConfig,
                   eval_step=None, max_frames: Optional[int] = None,
                   viz_dir: Optional[str] = None,
                   streaming: Optional[bool] = None) -> Dict:
    """Run the full eval protocol over `dataset`; returns the summary dict.

    `viz_dir` (or `cfg.viz_dir`) enables the reference's qualitative
    per-frame prediction dumps (`seg18/test.py:162-169` label2rgb /
    `segcata/cata_test.py:137-154` plot_experiment_foreval) as RGB PNGs.

    `streaming` (default `cfg.streaming_eval`) serves sliding-window frames
    through the feature-cached `StreamingSegmenter` — predictions are
    bit-equal to the full-clip path, so metrics are unchanged; frames whose
    clip is not the previous clip advanced by one slot (sequence starts,
    the below-`t` fallback clips, `rate`-subsampled gaps) fall back to the
    full-clip eval step and re-seed the cache. The summary reports
    `streamed_frames`.
    """
    import os

    import jax.numpy as jnp

    from stswincl_tpu.eval.visualization import (
        ENDOVIS_COLORMAP, save_prediction)

    viz_dir = viz_dir or getattr(cfg, "viz_dir", None)
    if viz_dir:
        os.makedirs(viz_dir, exist_ok=True)
    is_cadis = cfg.data.dataset == "cadis"
    if streaming is None:
        streaming = getattr(cfg, "streaming_eval", False)
    if streaming and not (hasattr(model, "swin_dim")
                          and hasattr(dataset, "sliding_from")):
        import logging
        logging.getLogger("stswincl").warning(
            "streaming_eval: unsupported for %s on %s — full-clip eval",
            type(model).__name__, type(dataset).__name__)
        streaming = False
    # CaDIS scores at (540, 960) (`cata_test.py:129`); apply the same remap
    # `pipelines/seg.py` / `run_test` use so the streaming segmenter and a
    # caller-supplied eval_step agree on the prediction resolution
    eval_hw = tuple(cfg.eval_hw)
    if is_cadis and eval_hw == (1024, 1280):
        eval_hw = (540, 960)
    segmenter = None
    if streaming:
        from stswincl_tpu.pipelines.streaming import StreamingSegmenter
        segmenter = StreamingSegmenter(
            model, {"params": params, "batch_stats": batch_stats},
            out_hw=eval_hw, align_out=not is_cadis)
    if eval_step is None:
        eval_step = make_seg_eval_step(model, out_hw=eval_hw,
                                       align_corners=not is_cadis)
    if is_cadis:
        num_classes = CADIS_CLASS_NUM[cfg.data.tag]
        cm = ConfusionMatrix(num_classes - 1)  # ignore class excluded
    else:
        evaluator = EndovisEvaluator(num_classes=cfg.data.num_classes)

    n = len(dataset)
    if max_frames is not None:
        n = min(n, max_frames)
    timings = []
    cache, prev_path, streamed = None, None, 0

    # host-side prefetch: decode sample i+1 (PIL loads dominate the host
    # cost) while the device runs frame i — the reference loop loads and
    # infers strictly serially (`seg18/test.py:148-160`)
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)
    try:
        nxt = pool.submit(dataset.get, 0, _seeded_rng(0, 0, 0)) if n else None
        for i in range(n):
            try:
                sample = nxt.result()
            except Exception as e:
                # a prefetch exception would otherwise surface one loop
                # iteration late, attributed to the wrong frame
                raise RuntimeError(
                    f"prefetch of eval sample {i} failed") from e
            if i + 1 < n:
                nxt = pool.submit(dataset.get, i + 1,
                                  _seeded_rng(0, 0, i + 1))
            clip = sample["image"][None]  # (1, t, H, W, 3)
            label = sample["label"]
            tic = time.perf_counter()
            path = sample.get("path")
            if (segmenter is not None and cache is not None
                    and prev_path is not None and path is not None
                    and dataset.sliding_from(prev_path, path)):
                cache, pred = segmenter.predict_next(
                    cache, jnp.asarray(clip[:, -1]))
                streamed += 1
            elif segmenter is not None:
                # non-sliding frame: seed the cache and predict in ONE forward
                cache, pred = segmenter.init_and_predict(jnp.asarray(clip))
            else:
                pred = eval_step(params, batch_stats, clip)
            prev_path = path
            pred = np.asarray(pred[0])
            timings.append(time.perf_counter() - tic)
            if pred.shape != label.shape:
                # score at the label's resolution: crop/resize mismatch guard for
                # synthetic/val paths where eval_hw differs from label size
                if i == 0:
                    import logging
                    logging.getLogger("stswincl").warning(
                        "evaluate_split: prediction %s resized (nearest) to label "
                        "%s — protocol deviation from eval_hw=%s",
                        pred.shape, label.shape, cfg.eval_hw)
                from PIL import Image
                pred = np.asarray(
                    Image.fromarray(pred.astype(np.int32), mode="I").resize(
                        (label.shape[1], label.shape[0]), Image.NEAREST))
            if viz_dir:
                path = sample.get("path")
                name = (f"seq{path[0]}_frame{path[1]}" if path is not None
                        else f"frame{i:05d}")
                save_prediction(
                    os.path.join(viz_dir, name + ".png"), pred,
                    colormap=None if is_cadis else ENDOVIS_COLORMAP,
                    cadis_tag=cfg.data.tag if is_cadis else None)
            if is_cadis:
                cm.update(label, pred)
            else:
                seq = sample["path"][0]
                evaluator.update(label, pred, int(seq))

    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    if is_cadis:
        pa = pixel_accuracy(cm.matrix)
        pac, pac_c = pixel_accuracy_per_class(cm.matrix)
        miou, miou_c = mean_iou(cm.matrix)
        summary = {"pa": pa, "pac": pac, "miou": miou, "iou": miou,
                   "frames": n}
    else:
        summary = evaluator.summary()
    summary["sec_per_frame"] = float(np.median(timings)) if timings else 0.0
    if segmenter is not None:
        summary["streamed_frames"] = streamed
    return summary


def run_test(cfg: SegTrainConfig):
    """`test` CLI command: load a checkpoint, run the full test protocol."""
    from stswincl_tpu.pipelines.common import (
        build_model, build_seg_dataset, init_model_variables)
    from stswincl_tpu.pipelines.seg import _warm_start
    from stswincl_tpu.ckpt import load_checkpoint, latest_step
    from stswincl_tpu.utils import setup_logger

    logger = setup_logger(cfg.log_dir)
    model, num_classes = build_model(cfg.model, cfg.data)
    variables = init_model_variables(model, cfg.data,
                                     clip=cfg.model.arch != "puredeeplab18")
    if cfg.torch_checkpoint:
        variables = _warm_start(cfg, variables, logger)
        params, stats = variables["params"], variables["batch_stats"]
    else:
        # `test_checkpoint` names the run to evaluate (full load —
        # `load_model_full_fortest` semantics, `LoadModel.py:125-156`);
        # `init_checkpoint` keeps its training-time meaning (warm start)
        # but is accepted here as a fallback for older launch scripts.
        ckpt_dir = cfg.test_checkpoint or cfg.init_checkpoint or cfg.ckpt_dir
        if cfg.test_checkpoint is None and cfg.init_checkpoint:
            logger.warning("test: loading from init_checkpoint=%s; prefer "
                           "test_checkpoint= for evaluation", ckpt_dir)
        state = load_checkpoint(ckpt_dir)
        params = state["params"]
        stats = state.get("batch_stats", variables.get("batch_stats", {}))

    split = "test"
    dataset = build_seg_dataset(cfg.data, split)
    if cfg.data.dataset == "cadis":
        cfg.eval_hw = (540, 960)
    summary = evaluate_split(model, params, stats, dataset, cfg)
    logger.info("test summary: %s", summary)
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in summary.items()})
    return summary
