"""DrQ augment, rot6d/SE(3), priority store, down-sampling, lerobot writer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.data.down_sampling import (
    answer_tag_penalty,
    down_sample_mask,
    reject_equal_reward_mask,
    tool_error_ratio,
)
from rlinf_tpu.data.lerobot_writer import (
    LeRobotDatasetWriter,
    read_lerobot_episode,
)
from rlinf_tpu.data.priority_store import PriorityStore
from rlinf_tpu.utils.augment import drq_crop_main, drq_random_shift
from rlinf_tpu.utils.rot6d import (
    matrix_to_rot6d,
    pose_to_SE3,
    quat_xyzw_to_matrix,
    quat_xyzw_to_rot6d,
    rot6d_to_matrix,
    rot6d_to_quat_xyzw,
    rot6d_to_quat_xyzw_safe,
    se3_body_compose,
    se3_body_delta,
    SE3_to_pose,
)


# -- drq --------------------------------------------------------------------

def test_drq_shift_preserves_shape_and_content_stats():
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 16, 16, 3)),
                       jnp.float32)
    out = drq_random_shift(jax.random.PRNGKey(0), imgs, pad=2)
    assert out.shape == imgs.shape
    # zero shift is in-range: some sample may equal input; all values come
    # from the padded canvas, so min/max are bounded by the input's
    assert float(out.max()) <= float(imgs.max()) + 1e-6
    assert float(out.min()) >= float(imgs.min()) - 1e-6
    # different key -> (almost surely) different crop
    out2 = drq_random_shift(jax.random.PRNGKey(1), imgs, pad=2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_drq_layout_dispatch():
    bchw = jnp.zeros((2, 3, 8, 8), jnp.float32)
    assert drq_crop_main(jax.random.PRNGKey(0), bchw).shape == (2, 3, 8, 8)
    bhwc = jnp.zeros((2, 8, 8, 3), jnp.float32)
    assert drq_crop_main(jax.random.PRNGKey(0), bhwc).shape == (2, 8, 8, 3)


# -- rot6d ------------------------------------------------------------------

def test_rot6d_roundtrip_matrix():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat_xyzw_to_matrix(q)
    # R is orthonormal with det 1
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    r6 = matrix_to_rot6d(R)
    R2 = rot6d_to_matrix(r6)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_rot6d_quat_roundtrip_up_to_sign():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q2 = rot6d_to_quat_xyzw(quat_xyzw_to_rot6d(q))
    # quaternion double cover: q == +-q2
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_rot6d_degenerate_raises_and_safe_fallback():
    bad = np.array([1.0, 0, 0, 2.0, 0, 0], np.float32)  # collinear
    with pytest.raises(ValueError):
        rot6d_to_matrix(bad)
    q = rot6d_to_quat_xyzw_safe(bad)
    np.testing.assert_array_equal(q, [0, 0, 0, 1])


def test_se3_body_delta_compose_inverse():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4,)); q /= np.linalg.norm(q)
    q2 = rng.normal(size=(4,)); q2 /= np.linalg.norm(q2)
    T_state = pose_to_SE3(rng.normal(size=3).astype(np.float32), q)
    T_abs = pose_to_SE3(rng.normal(size=3).astype(np.float32), q2)
    delta = se3_body_delta(T_state, T_abs)
    np.testing.assert_allclose(
        se3_body_compose(T_state, delta), T_abs, atol=1e-5
    )
    pos, quat = SE3_to_pose(T_abs)
    np.testing.assert_allclose(pos, T_abs[:3, 3], atol=1e-6)


# -- priority store -----------------------------------------------------------

class _Traj:
    def __init__(self, name, versions=None):
        self.name = name
        self.versions = versions


def test_priority_store_eviction_and_topn():
    ps = PriorityStore(maxsize=3)
    ps.add((1.0, 1.0), _Traj("a"))
    ps.add((3.0, 3.0), _Traj("c"))
    ps.add((2.0, 2.0), _Traj("b"))
    top = ps.topn(2)
    assert [t.name for t in top] == ["c", "b"]  # highest first
    # eviction drops the lowest priority, never-used -> counted
    ps.add((4.0, 4.0), _Traj("d"))
    assert len(ps) == 3
    assert ps.get_metric()["discarded_unused"] == 1  # "a" was never topn'd
    # below-floor insert rejected when full
    assert not ps.add((0.5, 0.5), _Traj("reject"))
    assert ps.get_metric()["discarded_unused"] == 2


def test_priority_store_remove_below_and_version_metric():
    ps = PriorityStore(maxsize=4)
    ps.add((1.0, 1.0), _Traj("v1", versions=np.array([1, 1, 2])))
    ps.add((2.0, 2.0), _Traj("v2", versions=np.array([2, 2, 2])))
    m = ps.get_metric()
    assert abs(m[2]["ratio"] - 4 / 6) < 1e-6
    ps.remove_below(1.5)
    assert len(ps) == 1
    assert ps.topn(1)[0].name == "v2"


# -- down sampling -------------------------------------------------------------

def test_reject_equal_reward_groups():
    rewards = np.array([1, 1, 1, 0, 1, 0.5])
    mask = reject_equal_reward_mask(rewards, group_size=3)
    assert mask.tolist() == [False, False, False, True, True, True]


def test_down_sample_to_n_prefers_low_penalty():
    rewards = np.array([1.0, 1.0, 0.0, 0.0])
    texts = [
        "<answer>x</answer><|im_start|>assistant ok<|im_end|>",  # low penalty
        "no tags at all",                                        # high penalty
        "zero-a", "zero-b",
    ]
    mask = down_sample_mask(
        rewards, group_size=4,
        cfg={"down_sample_to_n": 2, "roc_answer_format": True},
        response_texts=texts,
    )
    assert mask.sum() == 2
    assert mask[0] and not mask[1]  # low-penalty positive kept
    assert mask[2] != mask[3] or mask[2:].sum() == 1  # one zero-reward kept


def test_penalty_helpers():
    assert tool_error_ratio("nothing") == 0.5
    t = "<tool_response>ok</tool_response><tool_response>ERROR</tool_response>"
    assert tool_error_ratio(t) == 0.5
    assert answer_tag_penalty("no tags") == 1.0


# -- lerobot writer --------------------------------------------------------------

def test_lerobot_writer_roundtrip(tmp_path):
    root = str(tmp_path / "ds")
    w = LeRobotDatasetWriter().create(root, fps=10)
    T = 6
    states = np.random.default_rng(0).normal(size=(T, 4)).astype(np.float32)
    actions = np.random.default_rng(1).normal(size=(T, 2)).astype(np.float32)
    imgs = (np.random.default_rng(2).uniform(size=(T, 8, 8, 3)) * 255).astype(
        np.uint8
    )
    w.add_episode(states=states, actions=actions, task="pick cube",
                  images={"main": imgs},
                  rewards=np.ones(T, np.float32),
                  dones=np.zeros(T, bool))
    w.add_episode(states=states, actions=actions, task="pick cube")
    w.finalize()

    import json, os
    info = json.load(open(os.path.join(root, "meta", "info.json")))
    assert info["total_episodes"] == 2 and info["total_frames"] == 2 * T
    assert info["features"]["action"]["shape"] == [2]

    ep = read_lerobot_episode(root, 0)
    np.testing.assert_allclose(ep["observation.state"], states, atol=1e-6)
    np.testing.assert_allclose(ep["action"], actions, atol=1e-6)
    np.testing.assert_array_equal(ep["observation.images.main"], imgs)
    assert ep["episode_index"].tolist() == [0] * T
    # second episode's global index continues
    ep2 = read_lerobot_episode(root, 1)
    assert ep2["index"][0] == T
