"""realtime_stereo_matcher_tpu: a TPU-native real-time stereo matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``babiking/realtime_stereo_matcher`` (reference mounted read-only at
/root/reference): the MobileStereoNet v1-v4 / MobileDispNetC model family,
an SGBM classical baseline, SceneFlow/KITTI/ETH3D/Middlebury data pipelines,
a sequence-loss training loop, and benchmark-grade evaluation -- all built
TPU-first (NHWC layouts, MXU-friendly cost volumes, pjit/shard_map device
meshes, Pallas kernels on the hot path).

Repo-wide sign convention (inherited from the reference, see
reference dataset/stereo_datasets.py:78 and model/*.py): disparity is
represented as *negative horizontal flow*.  Every model returns negative
disparity maps; evaluation treats ``flow_pr < 0`` as valid.
"""

__version__ = "0.1.0"
