"""Embodied SFT/BC: scripted-expert episodes -> flow/NLL/L1 cloning; the
flow-BC'd GR00T policy must solve image_reach at eval."""

import numpy as np
import jax
import jax.numpy as jnp

from rlinf_tpu.envs.toy import ImageReachEnv
from rlinf_tpu.envs.wrappers import CollectEpisodeWrapper
from rlinf_tpu.data.datasets import EpisodeDataset
from rlinf_tpu.models.embodiment.gr00t import GR00TConfig, GR00TPolicy
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.models.embodiment.vla_policy import VLAPolicy
from rlinf_tpu.runners.embodied_sft_runner import EmbodiedSFTRunner
from rlinf_tpu.training.train_state import OptimizerConfig


def _collect_expert_episodes(tmp_path, n_steps=200):
    env = CollectEpisodeWrapper(
        ImageReachEnv(num_envs=8, seed=0, max_episode_steps=12,
                      goal_radius=0.25, dt=0.3),
        str(tmp_path),
    )
    obs = env.reset()
    for _ in range(n_steps):
        s = obs["states"]
        act = np.clip((s[:, 2:4] - s[:, :2]) / 0.3, -1, 1)  # straight-line expert
        out = env.step(act.astype(np.float32))
        obs = out.obs
    return EpisodeDataset(str(tmp_path))


def test_gr00t_flow_bc_solves_image_reach(tmp_path):
    ds = _collect_expert_episodes(tmp_path)
    assert ds.num_frames > 100
    policy = GR00TPolicy(GR00TConfig(
        action_dim=2, action_chunk=1, state_dim=4, hidden=64, layers=2,
        num_flow_steps=6,
    ))
    eval_env = ImageReachEnv(num_envs=16, seed=7, max_episode_steps=12,
                             goal_radius=0.25, dt=0.3)
    runner = EmbodiedSFTRunner(
        policy, ds, batch_size=128,
        optimizer=OptimizerConfig(lr=2e-3, clip_grad=1.0),
        eval_env=eval_env, eval_episodes=2, seed=0,
        checkpoint_dir=str(tmp_path / "ckpt"), save_interval=40,
    )
    hist = runner.run(max_steps=80)
    first = np.mean([h["sft/loss"] for h in hist[:5]])
    last = np.mean([h["sft/loss"] for h in hist[-5:]])
    assert last < first * 0.8, f"flow BC loss flat: {first:.4f} -> {last:.4f}"
    m = runner.evaluate()
    assert m.get("env/success_once", 0.0) > 0.5, m

    # auto-resume restores step + optimizer state
    runner2 = EmbodiedSFTRunner(
        policy, ds, batch_size=128,
        optimizer=OptimizerConfig(lr=2e-3, clip_grad=1.0),
        checkpoint_dir=str(tmp_path / "ckpt"), seed=0,
    )
    assert runner2.global_step == 80


def test_nll_and_l1_sft_steps(tmp_path):
    ds = _collect_expert_episodes(tmp_path, n_steps=40)
    # Gaussian NLL BC
    mlp = MLPGaussianPolicy(obs_dim=4, action_dim=2)
    r1 = EmbodiedSFTRunner(mlp, ds, batch_size=32, loss_type="nll",
                           optimizer=OptimizerConfig(lr=1e-3))
    h1 = r1.run(max_steps=5)
    assert np.isfinite(h1[-1]["sft/loss"]) and "sft/entropy" in h1[-1]
    # OFT L1 regression BC
    vla = VLAPolicy(image_size=32, patch_size=16, action_dim=2,
                    action_chunk=1, proprio_dim=4, hidden=32,
                    trunk_layers=1, vit_layers=1, heads=2)
    r2 = EmbodiedSFTRunner(vla, ds, batch_size=32, loss_type="l1",
                           optimizer=OptimizerConfig(lr=1e-3))
    h2 = r2.run(max_steps=5)
    assert h2[-1]["sft/loss"] < h2[0]["sft/loss"] * 1.5  # finite, moving
