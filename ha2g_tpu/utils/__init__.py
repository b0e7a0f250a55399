from ha2g_tpu.utils.average_meter import AverageMeter
from ha2g_tpu.utils.logging_utils import set_logger, set_random_seed
