from ha2g_tpu.ops.gru import GRU, GRUCell
from ha2g_tpu.ops.mel import (batched_log_mel, log_mel_np,
                              log_mel_spectrogram, mel_filterbank,
                              power_spectrogram, power_to_db)
