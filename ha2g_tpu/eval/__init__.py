from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator, frechet_distance
from ha2g_tpu.eval.metrics import (beat_consistency, maje_and_accel,
                                   motion_beat_times, onset_detect_times)
