"""SLAM-scale video geometry recipes (MegaSaM / ViPE / WildGS-SLAM).

The reference stages these three as README-only clone-and-run recipes
(``later/MegaSaM/README.md``, ``later/VIPE/README.md``,
``later/WildGS-SLAM/README.md`` — no vendored code). This package is the
TPU-first equivalent built from the framework's own verified components:

* :mod:`.ba` — dense-flow bundle adjustment (one jitted Gauss-Newton
  program: poses + per-frame depth scale/shift + optional focal).
* :mod:`.frontend` — keyframing, pair graphs, batched depth/flow inference.
* :mod:`.gaussians` — differentiable 3D Gaussian-splat renderer + mapper.
* Pipelines: ``megasam`` / ``vipe`` / ``wildgs_slam`` in ``registry.py``.
"""
