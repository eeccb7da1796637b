"""TPU chip registry (accelerator-abstraction analog) and rerun fault
harness (Megatron rerun state machine analog)."""

import numpy as np
import pytest

from rlinf_tpu.utils.chips import (
    SliceTopology,
    detect_chip,
    get_chip,
    slice_for,
)
from rlinf_tpu.utils.rerun import (
    ErrorInjector,
    InjectionKind,
    RerunStateMachine,
    RerunVerdict,
)


def test_chip_registry():
    v5e = get_chip("v5e")
    # 197 TFLOP/s bf16 / 394 TOPS int8 (the spec-sheet pair; the registry
    # briefly carried the int8 figure as bf16 — same r1 mistake flops.py
    # documents)
    assert v5e.bf16_flops == 197e12 and v5e.hbm_bw == 819e9
    assert v5e.int8_flops == 394e12
    assert get_chip("v5p").cores_per_chip == 2
    assert get_chip("v6e").bf16_flops > v5e.bf16_flops
    with pytest.raises(KeyError, match="Unknown TPU generation"):
        get_chip("v99")
    # arithmetic intensity: v5e breaks even around 240 FLOP/byte
    assert 200 < v5e.arithmetic_intensity < 300
    # flops.py's roofline and the chip registry must agree
    from rlinf_tpu.utils import flops as F

    assert F.ChipSpec.v5e().bf16_flops == v5e.bf16_flops
    # detection falls back to default on CPU test runtime
    assert detect_chip("v5p").generation in {"v4", "v5e", "v5p", "v6e"}


def test_slice_topology_collective_costs():
    topo = slice_for("v5e", 16)
    assert topo.num_chips == 16 and topo.mesh_shape == (4, 4)
    # 4-chip dims wrap -> 4x per-link bandwidth usable per axis
    assert topo.axis_bandwidth(0) == 4 * topo.chip.ici_bw_per_link
    # all-reduce of 1GB/chip on a wrapped 4-ring
    t = topo.all_reduce_time(1e9, dim=0)
    expected = 2 * 1e9 * (3 / 4) / (4 * 45e9)
    assert np.isclose(t, expected)
    assert topo.all_gather_time(1e9, 0) < t
    # no-wrap 2-ring has half the axis bandwidth
    small = SliceTopology(get_chip("v5e"), (2, 2))
    assert small.axis_bandwidth(0) == 2 * 45e9
    assert topo.all_reduce_time(1e9, 0) > 0 and small.all_reduce_time(0.0, 0) == 0


def _step_factory():
    calls = {"n": 0}

    def step(x):
        calls["n"] += 1
        return {"loss": np.float32(x * 2.0)}

    return step, calls


def test_rerun_ok_path():
    step, calls = _step_factory()
    rsm = RerunStateMachine(max_reruns=2)
    result, report = rsm.run(0, step, 3.0)
    assert report.verdict is RerunVerdict.OK and report.attempts == 1
    assert result["loss"] == 6.0 and calls["n"] == 1


def test_rerun_recovers_transient_fault():
    step, calls = _step_factory()
    inj = ErrorInjector(inject_at_steps=(5,), kind=InjectionKind.EXCEPTION)
    rsm = RerunStateMachine(max_reruns=2, injector=inj)
    result, report = rsm.run(5, step, 1.0)
    assert report.verdict is RerunVerdict.TRANSIENT
    assert result["loss"] == 2.0
    # recovery re-executes once more to confirm determinism
    assert calls["n"] == 2


def test_rerun_persistent_fault_raises():
    step, _ = _step_factory()
    inj = ErrorInjector(
        inject_at_steps=(1,), kind=InjectionKind.PERSISTENT_EXCEPTION
    )
    rsm = RerunStateMachine(max_reruns=2, injector=inj)
    with pytest.raises(RuntimeError, match="injected persistent"):
        rsm.run(1, step, 1.0)
    assert rsm.reports[-1].verdict is RerunVerdict.PERSISTENT


def test_rerun_detects_nondeterminism():
    step, _ = _step_factory()
    inj = ErrorInjector(inject_at_steps=(2,), kind=InjectionKind.CORRUPT_RESULT)
    rsm = RerunStateMachine(validate_determinism=True, injector=inj)
    _, report = rsm.run(2, step, 1.0)
    assert report.verdict is RerunVerdict.NONDETERMINISTIC
    # clean steps validate silently
    _, report = rsm.run(3, step, 1.0)
    assert report.verdict is RerunVerdict.OK


def test_rerun_wraps_jitted_train_step():
    """The harness must compose with a real jitted step (pure fn contract)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def train_step(w, x):
        loss = jnp.sum((w * x - 1.0) ** 2)
        return w - 0.1 * jax.grad(lambda w: jnp.sum((w * x - 1.0) ** 2))(w), loss

    w = jnp.ones((4,))
    x = jnp.full((4,), 2.0)
    rsm = RerunStateMachine(max_reruns=1, validate_determinism=True)
    (w2, loss), report = rsm.run(0, train_step, w, x)
    assert report.verdict is RerunVerdict.OK
    assert float(loss) == pytest.approx(4.0)
