from ha2g_tpu.data.dataset import (MotionFilter, WindowedSamples,
                                   resample_pose_seq,
                                   spectrogram_length_for, window_clips)
from ha2g_tpu.data.loader import BatchLoader
from ha2g_tpu.data.synthetic import default_mean_dir_vec, synthetic_clips
from ha2g_tpu.data.vocab import Vocab, build_vocab
