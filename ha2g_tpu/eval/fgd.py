"""Embedding-space (FGD) evaluator.

Rebuild of scripts/model/embedding_space_evaluator.py: a frozen gesture
autoencoder embeds real and generated pose sequences; scores are the Frechet
distance between Gaussian fits of the two feature populations, the mean L1
feature distance, and the diversity score.

TPU-native split: embedding runs batched on device (the hot part); the
O(32^2)/O(128^2) covariance + sqrtm statistics run on host via scipy exactly
as the reference (mseitzer FID port semantics incl. the eps fallback,
embedding_space_evaluator.py:156-209).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy import linalg

from ha2g_tpu.models.embedding_net import EmbeddingNet
from ha2g_tpu.models.motion_ae import MotionAE


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))
    (embedding_space_evaluator.py:157-209)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component {}".format(
                np.max(np.abs(covmean.imag))))
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


class EmbeddingSpaceEvaluator:
    """push_samples on device, get_scores on host."""

    def __init__(self, pose_dim: int, n_frames: int, params, batch_stats,
                 latent_dim: int = 128):
        self.pose_dim = pose_dim
        if pose_dim == 126:
            # TED Expressive uses the MotionAE embedder
            # (embedding_space_evaluator.py:31-34)
            self.net = MotionAE(pose_dim=pose_dim, latent_dim=latent_dim)
            self._embed = jax.jit(self._embed_motion_ae)
        else:
            self.net = EmbeddingNet(pose_dim=pose_dim, n_frames=n_frames,
                                    mode="pose")
            self._embed = jax.jit(self._embed_embedding_net)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.reset()

    def reset(self):
        self.real_feat_list: list[np.ndarray] = []
        self.generated_feat_list: list[np.ndarray] = []
        self.recon_err_diff: list[float] = []

    def get_no_of_samples(self) -> int:
        return len(self.real_feat_list)

    # ---- device-side embedding ------------------------------------------
    def _embed_motion_ae(self, poses):
        recon, feat = self.net.apply(self.variables, poses, train=False)
        return feat, recon

    def _embed_embedding_net(self, poses):
        out = self.net.apply(self.variables, None, None, None, poses,
                             input_mode="pose", variational_encoding=False,
                             train=False)
        _, _, _, feat, _, _, recon = out
        return feat, recon

    def push_samples(self, generated_poses, real_poses):
        """generated/real: (B, T, pose_dim) dir-vec arrays."""
        real_feat, real_recon = self._embed(jnp.asarray(real_poses))
        gen_feat, gen_recon = self._embed(jnp.asarray(generated_poses))
        self.real_feat_list.append(np.asarray(real_feat))
        self.generated_feat_list.append(np.asarray(gen_feat))
        # recon-gap diagnostic (embedding_space_evaluator.py:79-101)
        def recon_err(recon, target):
            r = np.asarray(recon)
            t = np.asarray(target)
            e = np.mean(np.abs(r - t), axis=(1, 2))
            e += np.mean(np.abs(np.diff(r, axis=1) - np.diff(t, axis=1)),
                         axis=(1, 2))
            return np.sum(e)
        self.recon_err_diff.append(
            recon_err(gen_recon, generated_poses) -
            recon_err(real_recon, real_poses))

    # ---- host-side scores --------------------------------------------------
    def get_scores(self) -> tuple[float, float]:
        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        try:
            fd = frechet_distance(
                np.mean(generated, axis=0), np.cov(generated, rowvar=False),
                np.mean(real, axis=0), np.cov(real, rowvar=False))
        except ValueError:
            fd = 1e10
        feat_dist = float(np.mean(
            np.sum(np.abs(real - generated[:real.shape[0]]), axis=-1)))
        return fd, feat_dist

    def get_features_for_viz(self):
        """2-D projection of real vs generated features for inspection
        (reference uses UMAP, embedding_space_evaluator.py:104-113; umap is
        not bundled so PCA is the default with UMAP used when available)."""
        generated = np.vstack(self.generated_feat_list)
        real = np.vstack(self.real_feat_list)
        stacked = np.vstack([generated, real])
        try:
            import umap  # type: ignore
            emb = umap.UMAP().fit_transform(stacked)
        except ImportError:
            from sklearn.decomposition import PCA
            emb = PCA(n_components=2).fit_transform(stacked)
        n = generated.shape[0]
        return emb[n:], emb[:n]  # (real, generated) like the reference

    def get_diversity_scores(self, rng: Optional[np.random.Generator] = None
                             ) -> float:
        """Mean L1 between first-500-batches features and a shuffled-batch
        view (embedding_space_evaluator.py:115-125).  Like the reference's
        fresh torch.randperm, the default rng draws fresh entropy — a fixed
        seed can permute a small batch list to the identity, collapsing the
        score to 0."""
        rng = rng or np.random.default_rng()
        feat1 = np.vstack(self.generated_feat_list[:500])
        idx = rng.permutation(len(self.generated_feat_list))[:500]
        feat2 = np.vstack([self.generated_feat_list[i] for i in idx])
        n = min(feat1.shape[0], feat2.shape[0])
        return float(np.mean(np.sum(np.abs(feat1[:n] - feat2[:n]), axis=-1)))
