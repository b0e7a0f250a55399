"""Subprocess body for the end-to-end FSDP CLI training test.

Run as `python -m tests.fsdp_cli_child` from the repo root by
tests/test_parallel.py::test_cli_train_fsdp_matches_dp.  Trains the tiny
hierarchy config through the REAL CLI entry (`cli.cmd_train`) with
`--fsdp_devices 2` — the product path a user takes to train FSDP-sharded
(Config.fsdp_devices -> Trainer hybrid_mesh + shard_state_fsdp,
train/loop.py) — then verifies the Trainer actually sharded the state and
prints the final validation loss for the parent to compare against a
pure-DP run of the same config.

Isolated in its own process because XLA:CPU's in-process collective
rendezvous can SIGABRT the whole process when virtual-device threads pick
up two independent collectives in different orders and deadlock.  The
concurrency-optimized HLO scheduler is disabled as the root-cause fix
(chains the collectives; validated on the dryrun's identical failure,
__graft_entry__.py), with short rendezvous timeouts so a residual
deadlock dies fast enough for the parent's retry.  Prints FSDP_CLI_OK on
success.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_enable_concurrency_optimized_scheduler=false"
        " --xla_cpu_collective_timeout_seconds=90"
        " --xla_cpu_collective_call_terminate_timeout_seconds=90").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from ha2g_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache(min_compile_secs=2, tag="tests")

# identical hyperparameters on both sides; only model_save_path and
# --fsdp_devices differ between the DP parent and this FSDP child
CONFIG_YAML = """\
model: hierarchy
dataset: ted_gesture
name: fsdp_cli
train_data_path: synthetic
val_data_path: synthetic
model_save_path: {out}
epochs: 1
batch_size: 8
hidden_size: 32
n_layers: 1
wordembed_dim: 32
dropout_prob: 0.0
loader_workers: 0
random_seed: 7
save_result_video: false
"""


def final_loss(out_dir) -> float:
    import json
    from pathlib import Path

    rows = [json.loads(l) for l in
            (Path(out_dir) / "history.jsonl").read_text().splitlines()]
    return float(rows[-1]["loss"])


def main():
    import tempfile
    from pathlib import Path

    from ha2g_tpu import cli
    from ha2g_tpu.config import parse_cli
    from ha2g_tpu.train.loop import Trainer

    root = Path(tempfile.mkdtemp(prefix="fsdp_cli_"))
    out = root / "out"
    cfg_path = root / "tiny.yaml"
    cfg_path.write_text(CONFIG_YAML.format(out=out))
    argv = ["--config", str(cfg_path), "--fsdp_devices", "2"]

    # the sharding the CLI config produces: hybrid mesh + FSDP state
    cfg = parse_cli(argv)
    assert cfg.fsdp_devices == 2, cfg.fsdp_devices
    cfg2, lang, speaker, train_s, val_s = cli._prepare(cfg)
    trainer = Trainer(cfg2, train_s, val_s, lang, speaker)
    assert "model" in trainer.mesh.axis_names, trainer.mesh
    assert trainer.mesh.shape == {"data": 4, "model": 2}, trainer.mesh
    state = trainer.init_state()
    n_sharded = sum(1 for l in jax.tree_util.tree_leaves(state.params)
                    if not l.sharding.is_fully_replicated)
    assert n_sharded >= 5, n_sharded

    # the actual e2e CLI run
    rc = cli.cmd_train(argv)
    assert rc == 0, rc

    # resume path: Trainer._place_state must re-shard the loaded state
    # onto the hybrid mesh (train/loop.py fit(resume_from=)); one more
    # epoch from checkpoint_final must run sharded and stay finite
    import numpy as np
    ckpt = out / "checkpoint_final"
    assert ckpt.exists(), ckpt
    trainer2 = Trainer(cfg2, train_s, val_s, lang, speaker)
    state2, _hist = trainer2.fit(epochs=2, save_path=str(out / "resumed"),
                                 resume_from=str(ckpt))
    n_sharded2 = sum(1 for l in jax.tree_util.tree_leaves(state2.params)
                     if not l.sharding.is_fully_replicated)
    assert n_sharded2 >= 5, n_sharded2
    loss2 = final_loss(out / "resumed")
    assert np.isfinite(loss2), loss2

    print(f"FSDP_CLI_OK loss={final_loss(out)!r} sharded={n_sharded} "
          f"resumed_sharded={n_sharded2} resumed_loss={loss2!r}")


if __name__ == "__main__":
    main()
