"""ha2g_tpu: TPU-native co-speech gesture generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
alvinliu0/HA2G (CVPR 2022): hierarchical audio-to-gesture generation on
TED Gesture (27-dim pose) and TED Expressive (126-dim) plus the trimodal-GAN,
seq2seq, speech2gesture and joint-embedding baselines, FGD/BC/MAJE/diversity
evaluation, and a sliding-window synthesis engine.
"""

__version__ = "0.1.0"

from ha2g_tpu.config import Config
from ha2g_tpu.skeleton import (SKELETONS, TED_EXPRESSIVE, TED_GESTURE,
                               SkeletonSpec, skeleton_for_pose_dim)
