"""Embodied dataset family (VERDICT r3 item 8): norm stats, action-chunk
windowing, image aug; consumed by the SFT runner end-to-end.

Reference analog: rlinf/data/datasets/ openpi/behavior SFT transforms
(norm stats + delta actions + aug windows)."""

import numpy as np

from rlinf_tpu.data.embodied_datasets import (
    ActionChunkDataset,
    NormStats,
    augment_images,
    compute_norm_stats,
    load_norm_stats,
    save_norm_stats,
)


def _toy_episodes(n_ep=3, T=10, A=4):
    rng = np.random.default_rng(0)
    eps = []
    for e in range(n_ep):
        eps.append({
            "obs/states": rng.normal(size=(T, 6)).astype(np.float32) * 3 + 1,
            "obs/images": rng.integers(
                0, 255, (T, 16, 16, 3)).astype(np.uint8),
            "actions": rng.normal(size=(T, A)).astype(np.float32) * 2,
        })
    return eps


def test_norm_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, 4)).astype(np.float32) * 5 + 2
    stats = compute_norm_stats({"actions": x})["actions"]
    z = stats.normalize(x, "normal")
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1) < 0.05
    np.testing.assert_allclose(stats.unnormalize(z, "normal"), x, rtol=1e-4)

    q = stats.normalize(x, "q99")
    assert q.min() >= -1.0 and q.max() <= 1.0
    inner = (x > stats.q01) & (x < stats.q99)
    np.testing.assert_allclose(
        stats.unnormalize(stats.normalize(x, "q99"), "q99")[inner],
        x[inner], rtol=1e-3, atol=1e-3,
    )

    path = str(tmp_path / "norm_stats.json")
    save_norm_stats({"actions": stats}, path)
    loaded = load_norm_stats(path)["actions"]
    np.testing.assert_allclose(loaded.q99, stats.q99)


def test_chunk_windowing_and_padding():
    eps = _toy_episodes(T=6)
    ds = ActionChunkDataset(eps, horizon=4, norm_mode_actions="normal")
    assert ds.num_frames == 18
    # frame at t=4 of a 6-step episode: 2 real + 2 padded steps
    chunk, mask = ds._chunk(eps[0], 4)
    assert chunk.shape == (4, 4)
    assert mask.tolist() == [True, True, False, False]
    np.testing.assert_allclose(chunk[2:], 0.0)
    np.testing.assert_allclose(chunk[0], eps[0]["actions"][4])

    batch = ds.sample_frames(8, np.random.default_rng(0))
    assert batch["actions"].shape == (8, 4, 4)
    assert batch["action_pad_mask"].shape == (8, 4)
    assert batch["obs/states"].shape == (8, 6)
    # state z-scored, padded action rows exactly zero
    assert abs(batch["obs/states"].mean()) < 1.5
    pad = ~batch["action_pad_mask"]
    np.testing.assert_allclose(batch["actions"][pad], 0.0)


def test_delta_actions():
    eps = _toy_episodes(T=6)
    ds = ActionChunkDataset(
        eps, horizon=2, delta_action_dims=[0, 1],
        norm_mode_actions="normal",
    )
    chunk, _ = ds._chunk(eps[0], 1)
    state = eps[0]["obs/states"][1]
    raw = eps[0]["actions"][1]
    np.testing.assert_allclose(chunk[0, 0], raw[0] - state[0], rtol=1e-5)
    np.testing.assert_allclose(chunk[0, 2], raw[2], rtol=1e-5)  # untouched


def test_unnormalize_inverts_sampling():
    eps = _toy_episodes(T=8)
    ds = ActionChunkDataset(eps, horizon=1, norm_mode_actions="q99")
    rng = np.random.default_rng(3)
    batch = ds.sample_frames(16, rng)
    restored = ds.unnormalize_actions(batch["actions"][:, 0])
    # q99 clips outliers; inner values must round-trip
    assert np.isfinite(restored).all()
    assert restored.std() > 0.5  # back in env units, not [-1, 1]


def test_image_augmentation():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    out = augment_images(np.random.default_rng(1), imgs)
    assert out.shape == imgs.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 255.0
    # augmentation actually changes pixels but is rng-deterministic
    assert not np.allclose(out, imgs.astype(np.float32))
    out2 = augment_images(np.random.default_rng(1), imgs)
    np.testing.assert_allclose(out, out2)


def test_sft_runner_consumes_chunk_dataset():
    """EmbodiedSFTRunner trains an MLP policy on flattened action chunks —
    loss must drop (the reference's SFT-over-openpi-dataset flow)."""
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy
    from rlinf_tpu.runners.embodied_sft_runner import EmbodiedSFTRunner
    from rlinf_tpu.training.train_state import OptimizerConfig

    H, A = 2, 4
    eps = _toy_episodes(T=10, A=A)
    # learnable mapping: action = f(state); keep images out for the MLP
    for ep in eps:
        s = ep["obs/states"]
        acts = np.concatenate([s[:, :2], s[:, :2] * -0.5], axis=1)
        ep["actions"] = acts.astype(np.float32)
        del ep["obs/images"]
    ds = ActionChunkDataset(eps, horizon=H, flatten_chunks=True)
    policy = MLPGaussianPolicy(obs_dim=6, action_dim=H * A, init_logstd=-1.0)
    runner = EmbodiedSFTRunner(
        policy, ds, batch_size=32,
        optimizer=OptimizerConfig(lr=1e-2, clip_grad=1.0), seed=0,
    )
    hist = runner.run(max_steps=40)
    first = np.mean([h["sft/loss"] for h in hist[:5]])
    last = np.mean([h["sft/loss"] for h in hist[-5:]])
    assert last < first, f"SFT loss did not drop: {first:.4f} -> {last:.4f}"


def test_steam_pair_dataset_binary_and_multibin():
    """STEAM pair dataset (reference data/datasets/steam/pair_dataset.py):
    binary fixed-stride pairs with end clamp; multi-bin resampled strides
    with length scaling."""
    from rlinf_tpu.data.embodied_datasets import (
        SteamPairDataset, signed_stride_to_bin,
    )

    r = np.random.default_rng(0)
    eps = [{"images": r.integers(0, 255, (T, 8, 8, 3), dtype=np.uint8)}
           for T in (6, 12)]
    ds = SteamPairDataset(eps, k=4, num_bins=2)
    assert len(ds) == 2 * (5 + 11)
    pos, neg = ds[0], ds[1]
    assert pos["label"] == 1 and neg["label"] == 0
    # forward pair goes t -> min(t+k, T-1); the negative is its reverse
    np.testing.assert_array_equal(pos["image_t"], neg["image_tk"])
    np.testing.assert_array_equal(pos["image_tk"], neg["image_t"])

    # multi-bin: labels always in range, sign halves correct
    ds4 = SteamPairDataset(eps, k=4, num_bins=4, seed=1)
    for i in range(0, len(ds4), 3):
        it = ds4[i]
        assert 0 <= it["label"] < 4
        assert (it["label"] >= 2) == (it["stride"] > 0)

    # bin mapping: near/far split at K/2
    assert signed_stride_to_bin(1, 4, 4) == 2
    assert signed_stride_to_bin(4, 4, 4) == 3
    assert signed_stride_to_bin(-1, 4, 4) == 1
    assert signed_stride_to_bin(-4, 4, 4) == 0
    # length scaling saturates short-episode strides outward
    ds_ls = SteamPairDataset(eps, k=4, num_bins=4, length_scale=True, seed=2)
    b = ds_ls.sample_batch(32)
    assert set(b["labels"].tolist()) <= {0, 1, 2, 3}
    assert b["image_t"].shape == (32, 8, 8, 3)


def test_steam_pair_dataset_feeds_critic():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.data.embodied_datasets import SteamPairDataset
    from rlinf_tpu.models.embodiment.value_critic import (
        SteamConfig, SteamCritic,
    )

    r = np.random.default_rng(3)
    eps = [{"images": r.random((10, 32, 32, 3)).astype(np.float32)}]
    ds = SteamPairDataset(eps, k=4, num_bins=2)
    batch = ds.sample_batch(8)
    crit = SteamCritic(SteamConfig(num_bins=2, ensemble_size=2))
    params = crit.init(jax.random.PRNGKey(0))
    loss, m = crit.loss(
        params, jnp.asarray(batch["image_t"]), jnp.asarray(batch["image_tk"]),
        jnp.asarray(batch["strides"]))
    assert np.isfinite(float(loss))
