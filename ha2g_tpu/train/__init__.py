from ha2g_tpu.train import cascade, losses
