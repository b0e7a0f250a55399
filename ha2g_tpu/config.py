"""Configuration system.

Mirrors every hyperparameter of the reference's configargparse parser
(scripts/parse_args.py:16-83) as a typed dataclass, loadable from YAML
(the reference's `--config` files map 1:1 onto these fields) with CLI
overrides.  Checkpoints embed the config dict, making them self-describing
like the reference's pickled args namespace (train_utils.py:172).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np


@dataclass
class Config:
    # identity
    name: str = "main"
    model: str = "hierarchy"  # hierarchy | multimodal_context | seq2seq |
    #                           speech2gesture | joint_embedding | gesture_autoencoder
    dataset: str = "ted_gesture"  # ted_gesture | ted_expressive (selects SkeletonSpec)

    # data paths
    train_data_path: str = ""
    val_data_path: str = ""
    test_data_path: str = ""
    model_save_path: str = "output"
    pose_representation: str = "3d_vec"
    mean_dir_vec: Optional[list[float]] = None
    mean_pose: Optional[list[float]] = None
    random_seed: int = -1
    save_result_video: bool = True

    # word embedding
    wordembed_path: Optional[str] = None
    wordembed_dim: int = 300
    freeze_wordembed: bool = False

    # model
    epochs: int = 10
    batch_size: int = 50
    dropout_prob: float = 0.3
    n_layers: int = 4
    hidden_size: int = 300
    z_type: str = "none"  # speaker | random | none
    input_context: str = "both"  # both | audio | text | none

    # dataset params
    motion_resampling_framerate: int = 15
    n_poses: int = 34
    n_pre_poses: int = 4
    subdivision_stride: int = 10
    loader_workers: int = 0

    pose_dim: int = 27
    latent_dim: int = 128

    # GAN
    gan_noise_size: int = 0

    # training
    learning_rate: float = 5e-4
    discriminator_lr_weight: float = 0.2
    loss_regression_weight: float = 70.0
    loss_gan_weight: float = 1.0
    loss_kld_weight: float = 0.1
    loss_reg_weight: float = 0.01
    loss_warmup: int = -1
    loss_contrastive_pos_weight: float = 0.2
    loss_contrastive_neg_weight: float = 0.005
    loss_physical_weight: float = 0.01
    mse_loss_weight: float = 50.0
    cos_loss_weight: float = 50.0
    static_loss_weight: float = 50.0
    motion_loss_weight: float = 50.0
    g_update_step: int = 5

    # eval
    eval_net_path: str = ""

    # --- TPU-native extensions (no reference counterpart) -------------------
    # compute dtype for the model ("float32" or "bfloat16")
    compute_dtype: str = "float32"
    # data-parallel mesh axis size; 0 = all local devices
    dp_devices: int = 0
    # FSDP/ZeRO model-axis size: >1 builds a hybrid 2-D (data, model) mesh
    # where parameters + optimizer state shard over 'model'
    # (parallel/mesh.py::hybrid_mesh / shard_state_fsdp) while the batch
    # stays sharded over 'data'.  1 = pure DP (the reference-parity mode;
    # its only parallelism is DataParallel, train.py:132-143).
    fsdp_devices: int = 1
    # save optimizer state for mid-training resume (capability superset of the
    # reference, which has no resume path; SURVEY.md section 5.4)
    save_optimizer_state: bool = True
    # pose-diff L1 term in the embedding-AE recon loss: the reference's
    # H36M feature-extractor trainer adds it (`if True`,
    # train_feature_extractor.py:68-71) while train_iter_embed does not
    # (`if False`, train_joint_embed.py:29); auto-set on the H36M path
    embed_pose_diff_loss: bool = False
    # reproduce the reference's off-by-one expressive pre-seq head fill
    # (skeleton.py::SkeletonSpec.ref_routing_compat) — set automatically when
    # importing reference-trained expressive hierarchy checkpoints, whose
    # weights expect that layout; leave False for fresh training
    ref_routing_compat: bool = False

    # -------------------------------------------------------------------
    @property
    def skeleton(self):
        from ha2g_tpu.skeleton import REF_COMPAT_SKELETONS, SKELETONS
        table = REF_COMPAT_SKELETONS if self.ref_routing_compat else SKELETONS
        return table[self.dataset]

    @property
    def mean_dir_vec_array(self) -> np.ndarray:
        if self.mean_dir_vec is None:
            return np.zeros(self.pose_dim, dtype=np.float32)
        return np.asarray(self.mean_dir_vec, dtype=np.float32).reshape(-1)

    @property
    def mean_pose_array(self) -> np.ndarray:
        if self.mean_pose is None:
            return np.zeros(self.pose_dim + 3, dtype=np.float32)
        return np.asarray(self.mean_pose, dtype=np.float32).reshape(-1)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_yaml(cls, path: str | Path, **overrides) -> "Config":
        import yaml
        with open(path) as f:
            d = yaml.safe_load(f) or {}
        d.update(overrides)
        return cls.from_dict(d)


def parse_cli(argv: Optional[Sequence[str]] = None) -> Config:
    """CLI entry mirroring the reference's `--config file + flag overrides`
    pattern (parse_args.py:16)."""
    import argparse

    parser = argparse.ArgumentParser(description="ha2g_tpu")
    parser.add_argument("-c", "--config", required=True)
    known, rest = parser.parse_known_args(argv)
    cfg = Config.from_yaml(known.config)

    # any --field value pair overrides the YAML
    over = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        if f.type in ("bool", bool):
            over.add_argument(f"--{f.name}", type=lambda v: v.lower() in ("1", "true", "yes", "t", "y"))
        elif f.type in ("Optional[list[float]]",):
            over.add_argument(f"--{f.name}", type=float, nargs="*")
        else:
            py = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            over.add_argument(f"--{f.name}", type=py)
    ns, _ = over.parse_known_args(rest)
    updates = {k: v for k, v in vars(ns).items() if v is not None}
    return cfg.replace(**updates)
