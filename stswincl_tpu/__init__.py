"""STswinCL-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
intra- and inter-video surgical scene segmentation.

Re-implements, TPU-first, the full capability surface of the reference
PyTorch codebase (YuemingJin/STswinCL): the STswin segmentation network
(ResNet18-OS8 backbone + joint space-time windowed Swin stack + ASPP head),
the three-stage training pipeline (supervised intra-video, pixel-contrastive
inter-video pretraining with a momentum key encoder, joint fine-tune),
EndoVis2018 + CaDIS data pipelines, and the evaluation protocols.

Nothing here is a translation of the reference's CUDA/torch patterns: compute
is built on XLA-friendly static shapes, convolutions/attention batched onto
the MXU in NHWC/bf16, collectives expressed over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
