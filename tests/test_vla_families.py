"""VLA model families: openpi pi0/pi0.5, openvla, gr00t/starvla.

Mirrors the reference's per-family model tests (SURVEY.md §2.6). The key
invariant for RL: ``default_forward`` recomputed logprobs must equal the
logprobs the sampler reported (PPO importance ratio == 1 at step 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models import get_model, list_models
from rlinf_tpu.models.embodiment.gr00t import GR00TConfig, GR00TPolicy
from rlinf_tpu.models.embodiment.openpi import Pi0Config, Pi0Policy
from rlinf_tpu.models.embodiment.openvla import OpenVLAConfig, OpenVLAPolicy


def _obs(B=2, img=32, state_dim=8, text_len=4, vocab=256):
    k = jax.random.PRNGKey(0)
    return {
        "images": jax.random.uniform(k, (B, img, img, 3), jnp.float32),
        "states": jax.random.normal(jax.random.PRNGKey(1), (B, state_dim)),
        "instruction_ids": jnp.arange(B * text_len).reshape(B, text_len) % vocab,
        "instruction_mask": jnp.ones((B, text_len), bool),
    }


# ---------------------------------------------------------------------------
# pi0 / pi0.5
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("discrete_state", [False, True])
def test_pi0_sample_and_recompute_identity(discrete_state):
    cfg = Pi0Config(action_dim=3, action_chunk=2, state_dim=8,
                    num_flow_steps=3, discrete_state=discrete_state)
    policy = Pi0Policy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs()
    out = policy.predict_action_batch(params, jax.random.PRNGKey(2), obs)
    B = 2
    assert out.actions.shape == (B, (cfg.num_flow_steps + 1) * 2 * 3)
    assert out.logprobs.shape == (B, cfg.num_flow_steps)
    assert out.values.shape == (B,)
    # PPO identity: recompute under same params == sampled logprobs
    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(fwd["logprobs"]), np.asarray(out.logprobs),
        rtol=1e-4, atol=1e-4,
    )
    env_act = policy.env_actions(out.actions)
    assert env_act.shape == (B, 6)


def test_pi0_flow_bc_loss_and_grads():
    cfg = Pi0Config(action_dim=3, action_chunk=2, num_flow_steps=3)
    policy = Pi0Policy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs()
    target = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 3))

    loss, grads = jax.value_and_grad(
        lambda p: policy.flow_matching_loss(p, jax.random.PRNGKey(4), obs, target)
    )(params)
    assert np.isfinite(float(loss))
    # gradients reach the VLM trunk through the cached prefix KV
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads["vlm"])
    )))
    assert gnorm > 0


def test_pi0_deterministic_ode_action():
    cfg = Pi0Config(action_dim=3, action_chunk=2, num_flow_steps=3)
    policy = Pi0Policy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs()
    o1 = policy.predict_action_batch(params, jax.random.PRNGKey(5), obs,
                                     deterministic=True)
    o2 = policy.predict_action_batch(params, jax.random.PRNGKey(5), obs,
                                     deterministic=True)
    np.testing.assert_array_equal(np.asarray(o1.actions), np.asarray(o2.actions))


# ---------------------------------------------------------------------------
# openvla
# ---------------------------------------------------------------------------

def test_openvla_sample_recompute_identity():
    cfg = OpenVLAConfig(action_dim=4, action_bins=32)
    policy = OpenVLAPolicy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs(vocab=512 - 32)  # keep instruction ids out of the bin range
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    assert out.actions.shape == (2, 4)
    assert out.logprobs.shape == (2, 4)
    bins = np.asarray(out.actions)
    assert (bins >= 0).all() and (bins < 32).all()

    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(fwd["logprobs"]), np.asarray(out.logprobs),
        rtol=1e-4, atol=1e-4,
    )
    assert (np.asarray(fwd["entropy"]) > 0).all()


def test_openvla_greedy_matches_teacher_forced_argmax():
    """Cache-decode path numerics == full-forward path (the decode_step /
    forward_hidden agreement the LLM engine also guarantees)."""
    cfg = OpenVLAConfig(action_dim=3, action_bins=16)
    policy = OpenVLAPolicy(cfg)
    params = policy.init(jax.random.PRNGKey(7))
    obs = _obs(vocab=256)
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs,
                                      deterministic=True)
    # teacher-force the greedy tokens; their logprob must be the per-dim max
    fwd_lp = policy.default_forward(params, obs, out.actions)["logprobs"]
    np.testing.assert_allclose(
        np.asarray(fwd_lp), np.asarray(out.logprobs), rtol=1e-4, atol=1e-4
    )


def test_openvla_env_actions_denorm():
    cfg = OpenVLAConfig(action_dim=2, action_bins=4,
                        action_low=(0.0, -2.0), action_high=(1.0, 2.0))
    policy = OpenVLAPolicy(cfg)
    acts = policy.env_actions(jnp.array([[0.0, 3.0]]))
    a = np.asarray(acts)[0]
    assert 0.0 <= a[0] <= 1.0 and -2.0 <= a[1] <= 2.0
    # bin 0 maps low, bin 3 maps high (centers, so strictly inside)
    assert a[0] < 0.5 and a[1] > 0.0


# ---------------------------------------------------------------------------
# gr00t / starvla
# ---------------------------------------------------------------------------

def test_gr00t_sample_recompute_identity():
    cfg = GR00TConfig(action_dim=3, action_chunk=2, num_flow_steps=3,
                      text_vocab=64)
    policy = GR00TPolicy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs(vocab=64)
    obs["embodiment_id"] = jnp.array([0, 2])
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(fwd["logprobs"]), np.asarray(out.logprobs),
        rtol=1e-4, atol=1e-4,
    )


def test_gr00t_embodiment_conditioning_changes_actions():
    cfg = GR00TConfig(action_dim=3, action_chunk=2, num_flow_steps=2)
    policy = GR00TPolicy(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    obs = _obs()
    a0 = policy.predict_action_batch(
        params, jax.random.PRNGKey(1),
        {**obs, "embodiment_id": jnp.zeros((2,), jnp.int32)},
        deterministic=True,
    ).actions
    a1 = policy.predict_action_batch(
        params, jax.random.PRNGKey(1),
        {**obs, "embodiment_id": jnp.full((2,), 3, jnp.int32)},
        deterministic=True,
    ).actions
    assert not np.allclose(np.asarray(a0), np.asarray(a1))


def test_gr00t_bc_loss_finite():
    policy = GR00TPolicy(GR00TConfig(action_dim=3, action_chunk=2))
    params = policy.init(jax.random.PRNGKey(0))
    target = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 3))
    loss = policy.flow_matching_loss(params, jax.random.PRNGKey(4), _obs(),
                                     target)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def test_registry_families_present():
    names = list_models()
    for required in [
        "mlp_policy", "cnn_policy", "sac_policy", "flow_policy",
        "openpi_pi0", "openpi_pi05", "openvla", "openvla_oft",
        "gr00t", "starvla", "lingbotvla", "dexbotic_pi", "dexbotic_dm0",
        "abot_m0",
    ]:
        assert required in names, f"{required} missing from registry"


def test_registry_factories_build():
    p = get_model("openpi_pi0", action_dim=3, action_chunk=2)
    assert isinstance(p, Pi0Policy)
    p = get_model("starvla", action_dim=3, action_chunk=2)
    assert isinstance(p, GR00TPolicy) and p.cfg.num_embodiments == 1
    p = get_model("openvla", action_dim=3)
    assert isinstance(p, OpenVLAPolicy)


# ---------------------------------------------------------------------------
# e2e: VLA learns an image task (goal visible ONLY in the image)
# ---------------------------------------------------------------------------

def test_vla_oft_learns_image_reach():
    """OFT-style VLA PPO on image_reach with chunked actions — the in-tree
    analog of the reference's ManiSkill VLA e2e configs (SURVEY.md §4 tier 3).
    The proprio carries only the agent position; the goal must be read from
    the image, so success rising proves the vision path trains."""
    from rlinf_tpu.envs.toy import ImageReachEnv
    from rlinf_tpu.envs.wrappers import ActionChunkWrapper
    from rlinf_tpu.models.embodiment.vla_policy import VLAPolicy
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig

    class PosOnlyImageReach(ImageReachEnv):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.obs_spec = {"states": (2,), "images": (self.size, self.size, 3)}

        def _obs(self):
            o = super()._obs()
            o["states"] = o["states"][:, :2]
            return o

    env = ActionChunkWrapper(
        PosOnlyImageReach(num_envs=64, seed=0, max_episode_steps=16,
                          goal_radius=0.3, dt=0.3),
        chunk=2,
    )
    policy = VLAPolicy(
        image_size=32, patch_size=8, action_dim=2, action_chunk=2,
        proprio_dim=2, hidden=64, trunk_layers=2, vit_layers=2, heads=4,
        init_logstd=-0.5,
    )
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=8, num_epochs=2, num_mini_batches=4,
        gamma=0.9, gae_lambda=0.95, max_steps=40, seed=0,
    )
    runner = EmbodiedRunner(
        cfg, [env], policy, optimizer=OptimizerConfig(lr=2e-3, clip_grad=1.0),
    )
    hist = runner.run(max_steps=40)
    succ = [h.get("env/success_once", 0.0) for h in hist]
    early = float(np.mean(succ[:8]))
    late = float(np.mean(succ[-8:]))
    assert late > early + 0.05, f"success_once {early:.3f} -> {late:.3f}"
    assert late > 0.28, f"final success too low: {late:.3f}"
