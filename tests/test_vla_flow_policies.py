"""VLA policy (ViT + action chunks) and flow-matching policy tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.models.embodiment.flow_policy import FlowMatchingPolicy
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.models.embodiment.vla_policy import VLAPolicy


def test_vit_encode_shapes():
    cfg = ViTConfig(image_size=32, patch_size=16, hidden=32, layers=1, heads=2)
    params = init_vit(cfg, jax.random.PRNGKey(0))
    imgs = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    feats = vit_encode(params, cfg, imgs)
    assert feats.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.fixture(scope="module")
def vla():
    policy = VLAPolicy(
        image_size=32, patch_size=16, action_dim=4, action_chunk=3,
        proprio_dim=5, hidden=32, trunk_layers=1, vit_layers=1, heads=2,
    )
    params = policy.init(jax.random.PRNGKey(0))
    return policy, params


def test_vla_predict_and_forward_consistency(vla):
    policy, params = vla
    obs = {
        "images": jnp.zeros((2, 32, 32, 3), jnp.uint8),
        "states": jnp.ones((2, 5), jnp.float32),
    }
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    assert out.actions.shape == (2, 12)   # chunk 3 x action_dim 4 flattened
    assert out.logprobs.shape == (2, 12)
    assert out.values.shape == (2,)
    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(out.logprobs), np.asarray(fwd["logprobs"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.values), np.asarray(fwd["values"]), rtol=1e-4, atol=1e-5
    )


def test_vla_ppo_step(vla):
    """One embodied PPO update through the standard learner."""
    from rlinf_tpu.training.embodied_learner import (
        EmbodiedLossConfig, make_embodied_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )

    policy, _ = vla
    tx = make_optimizer(OptimizerConfig(lr=1e-4))
    state = create_train_state(policy.init, tx, jax.random.PRNGKey(0))
    step = make_embodied_train_step(policy, EmbodiedLossConfig(), tx)
    N = 4
    rng = np.random.default_rng(0)
    batch = {
        "obs/images": jnp.asarray(
            rng.integers(0, 255, (N, 32, 32, 3)), jnp.uint8
        ),
        "obs/states": jnp.asarray(rng.normal(size=(N, 5)), jnp.float32),
        "actions": jnp.asarray(rng.normal(size=(N, 12)), jnp.float32),
        "old_logprobs": jnp.asarray(rng.normal(size=(N, 12)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(rng.normal(size=(N,)), jnp.float32),
        "returns": jnp.asarray(rng.normal(size=(N,)), jnp.float32),
        "prev_values": jnp.asarray(rng.normal(size=(N,)), jnp.float32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["actor/loss"]))


# ---------------------------------------------------------------------------
# Flow policy
# ---------------------------------------------------------------------------

def test_flow_matching_loss_decreases():
    """BC on a deterministic obs->action map: flow loss must drop and ODE
    samples must approach the target."""
    policy = FlowMatchingPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64),
                                num_flow_steps=16)
    params = policy.init(jax.random.PRNGKey(0))

    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def update(params, opt, rng, obs, target):
        loss, grads = jax.value_and_grad(
            lambda p: policy.flow_matching_loss(p, rng, {"states": obs}, target)
        )(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    data_rng = np.random.default_rng(0)
    losses = []
    for i in range(400):
        obs = jnp.asarray(data_rng.uniform(-1, 1, (128, 2)), jnp.float32)
        target = 0.5 * obs  # simple learnable map
        rng, sub = jax.random.split(rng)
        params, opt, loss = update(params, opt, sub, obs, target)
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.5

    obs = jnp.asarray([[0.8, -0.6], [-0.4, 0.2]], jnp.float32)
    act = policy.sample_ode(params, jax.random.PRNGKey(2), {"states": obs})
    np.testing.assert_allclose(
        np.asarray(act), 0.5 * np.asarray(obs), atol=0.25
    )


def test_flow_sde_chain_logprob_recompute():
    """chain_logprobs under the SAME params must reproduce the sampled
    per-step logprobs exactly (the PPO ratio-1 property)."""
    policy = FlowMatchingPolicy(obs_dim=3, action_dim=2, num_flow_steps=5)
    params = policy.init(jax.random.PRNGKey(0))
    obs = {"states": jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)}
    out = policy.sample_sde(params, jax.random.PRNGKey(1), obs)
    assert out.chain.shape == (4, 6, 2)
    lp = policy.chain_logprobs(params, obs, out.chain)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(out.logprobs), rtol=1e-4, atol=1e-4
    )


def test_flow_policy_interface_roundtrip():
    policy = FlowMatchingPolicy(obs_dim=2, action_dim=3, num_flow_steps=4)
    params = policy.init(jax.random.PRNGKey(0))
    obs = {"states": jnp.zeros((2, 2), jnp.float32)}
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    # actions carry the flattened chain: (steps+1) * action_dim
    assert out.actions.shape == (2, 5 * 3)
    env_a = policy.env_actions(out.actions)
    assert env_a.shape == (2, 3)
    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(fwd["logprobs"]), np.asarray(out.logprobs), rtol=1e-4, atol=1e-4
    )
    # deterministic eval path
    det = policy.predict_action_batch(
        params, jax.random.PRNGKey(2), obs, deterministic=True
    )
    assert det.actions.shape == (2, 3)


def test_flow_sde_ppo_learns_point_reach():
    """The πRL recipe (reference pi_rl.rst): PPO over the flow-SDE denoising
    chain — sample_sde chains ride in `actions`, chain_logprobs give the
    ratio, GAE over env rewards. Success must rise on point_reach."""
    from rlinf_tpu.envs.toy import PointReachEnv
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig

    env = PointReachEnv(num_envs=64, seed=0, max_episode_steps=12,
                        goal_radius=0.35, dt=0.3)
    policy = FlowMatchingPolicy(
        obs_dim=4, action_dim=2, hidden_sizes=(64, 64), num_flow_steps=4,
        sde_noise_scale=0.7,
    )
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=12, num_epochs=2, num_mini_batches=4,
        gamma=0.9, gae_lambda=0.95, max_steps=30, seed=0,
    )
    runner = EmbodiedRunner(
        cfg, [env], policy,
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
    )
    hist = runner.run(max_steps=30)
    succ = [h.get("env/success_once", 0.0) for h in hist]
    first, last = np.mean(succ[:5]), np.mean(succ[-5:])
    assert last > first + 0.1, f"flow-SDE PPO not learning: {first} -> {last}"
