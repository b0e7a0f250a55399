from ha2g_tpu.dataset_pipeline.filtering import (ClipFilter,
                                                 select_main_speaker)
from ha2g_tpu.dataset_pipeline.assemble import assemble_clips, split_clips
