"""neuralrgbd_tpu — a TPU-native reimplementation of Neural RGB->D Sensing.

A brand-new JAX/XLA/Pallas framework with the capabilities of
NVlabs/neuralrgbd (CVPR 2019): continuous depth + uncertainty estimation
from a monocular RGB video via a Bayesian-filtered Depth Probability
Volume (DPV).

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):

- ``ops``       geometry core: camera model, differentiable resampling,
                plane-sweep cost volumes, DPV algebra (pure jnp + Pallas).
- ``models``    D-Net / K-Net / R-Net as Flax modules (NHWC / NDHWC).
- ``parallel``  device mesh + sharded train/infer steps (pjit, psum over ICI).
- ``data``      dataset loaders (ScanNet / 7Scenes / KITTI / single-folder)
                and the trajectory batch scheduler.
- ``train``     losses + the jitted training step and host loop.
- ``infer``     the jitted inference step, sliding-window loop, exporters.
- ``pose``      DSO driver contract + Local Bundle Adjustment in JAX.
- ``utils``     checkpointing (orbax), logging, torch-weight import.
"""

__version__ = "0.1.0"
