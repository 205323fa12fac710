"""Multi-host hygiene (VERDICT r2 weak #6): on a multi-process pod only
process 0 may write checkpoints/TB; the TRAIN set is host-sharded while
validation is deliberately replicated (every host must issue identical
SPMD eval calls — see cli/main.py). Multi-process behavior is faked via
monkeypatching — the standard single-process stand-in."""

import numpy as np
import jax
import pytest

from pose3d_tpu.core.config import CNNModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.train import create_train_state
from pose3d_tpu.train import loop as train_loop

TINY = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)


def _loader(n_batches, b=2):
    rng = np.random.default_rng(0)
    return [
        {
            "image": rng.uniform(size=(b, 32, 32, 3)).astype(np.float32),
            "depth": rng.uniform(1, 8, size=(b, 32, 32, 1)).astype(
                np.float32
            ),
            "keypoints_2d": rng.uniform(0.1, 0.9, size=(b, 17, 2)).astype(
                np.float32
            ),
            "joints_3d": (rng.normal(size=(b, 17, 3)) * 100).astype(
                np.float32
            ),
        }
        for _ in range(n_batches)
    ]


@pytest.mark.parametrize("process_index,expect_ckpt", [(0, True), (1, False)])
def test_checkpoint_writes_gated_on_primary(
    tmp_path, monkeypatch, process_index, expect_ckpt
):
    monkeypatch.setattr(jax, "process_index", lambda: process_index)
    model, variables = init_model(TINY, batch_size=2)
    state = create_train_state(model, variables)

    prefix = str(tmp_path / "ck")
    train_loop.train_model(
        state, "cnn", _loader(2), None, model=model,
        gradient_accumulation_steps=1, num_steps=2,
        checkpoint_prefix=prefix, eval_interval_steps=1000,
    )
    ckpts = list(tmp_path.glob("ck_cnn_step_*"))
    assert bool(ckpts) == expect_ckpt, (process_index, ckpts)


def test_train_dataset_host_sharding_partitions_chunks(tmp_path):
    """Faked host_shard_info values → disjoint, covering chunk split
    (the property cli/main.py applies to the TRAIN set; validation is
    intentionally replicated — identical SPMD call sequences per host)."""
    from tests.helpers_synthetic import make_synthetic_dataset

    make_synthetic_dataset(
        tmp_path / "chunks", num_chunks=4, num_samples=2,
        image_hw=(16, 16), prefix="test",
    )
    from pose3d_tpu.data import StreamingChunkedDataset

    seen = []
    for shard in (0, 1):
        ds = StreamingChunkedDataset(
            "test", str(tmp_path / "chunks"), image_size=(16, 16),
            cache_dir=tmp_path / "cache", shuffle=False,
            shuffle_chunks=False, shard_id=shard, num_shards=2,
        )
        seen.append({f.name for f in ds.chunk_files})
    assert seen[0] and seen[1]
    assert not (seen[0] & seen[1])
    assert len(seen[0] | seen[1]) == 4
