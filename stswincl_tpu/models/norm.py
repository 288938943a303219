"""Shared normalization constants — the single source of truth.

Every BatchNorm in the model family uses the reference's torch defaults
(`nn.BatchNorm2d(...)`: momentum 0.1, eps 1e-5 — e.g.
`/root/reference/seg18/net/Ours/resnet.py:30`, `base18.py:62`); in flax
convention that torch momentum is ``1 - 0.1 = 0.9``.

The stage-2 parallel key/query passes rebuild the BatchNorm running-stats
EMA chain OUTSIDE the modules (`train/train_contrast.py::make_key_pass`),
so the fold constant there must equal the in-module momentum. Importing
both from here makes that equality structural: a model that wants a
different momentum must either change this constant (fold follows) or stop
being eligible for the folded parallel pass.
"""

BN_MOMENTUM = 0.9   # flax convention; == torch BatchNorm2d momentum 0.1
BN_EPSILON = 1e-5
