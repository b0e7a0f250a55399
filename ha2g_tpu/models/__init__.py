from ha2g_tpu.models import (common, embedding_net, hierarchy, motion_ae,
                             multimodal_context, resnet_se, seq2seq,
                             speech2gesture, tcn)
from ha2g_tpu.models.embedding_net import EmbeddingNet
from ha2g_tpu.models.hierarchy import (ConvDiscriminator,
                                       HierarchicalPoseGenerator,
                                       HierarchicalWavEncoder)
from ha2g_tpu.models.motion_ae import MotionAE
from ha2g_tpu.models.multimodal_context import PoseGenerator, WavEncoder
from ha2g_tpu.models.seq2seq import Seq2SeqNet
from ha2g_tpu.models.tcn import TextEncoderTCN
