"""Tests for checkpoint weight averaging (SWA) and epoch-spec parsing."""

import numpy as np
import pytest

from roadseg_tpu.utils.checkpoint import average_states, parse_epoch_spec


def _state(step, scale):
    return {
        "step": np.asarray(step, np.int32),
        "params": {"dense": {"kernel": np.full((2, 3), scale, np.float32),
                             "bias": np.full((3,), scale, np.float32)}},
        "opt_state": ({"trace": {"dense": {
            "kernel": np.full((2, 3), scale * 10, np.float32),
            "bias": np.full((3,), scale * 10, np.float32)}}},),
    }


def test_average_states_means_params_keeps_last_rest():
    avg = average_states([_state(1, 1.0), _state(3, 3.0), _state(2, 2.0)])
    np.testing.assert_allclose(avg["params"]["dense"]["kernel"], 2.0)
    np.testing.assert_allclose(avg["params"]["dense"]["bias"], 2.0)
    # step/opt_state from the newest (step 3) state
    assert int(avg["step"]) == 3
    np.testing.assert_allclose(
        avg["opt_state"][0]["trace"]["dense"]["kernel"], 30.0)


def test_average_states_preserves_dtype_and_int_leaves():
    s1, s2 = _state(1, 1.0), _state(2, 2.0)
    s1["params"]["counter"] = np.asarray(7, np.int32)
    s2["params"]["counter"] = np.asarray(9, np.int32)
    avg = average_states([s1, s2])
    assert avg["params"]["dense"]["kernel"].dtype == np.float32
    # int leaves are not averaged; newest state's tree is the base but
    # tree.map uses the first (sorted-by-step) state's non-float leaf
    assert int(avg["params"]["counter"]) in (7, 9)


def test_single_state_identity():
    s = _state(5, 4.0)
    avg = average_states([s])
    np.testing.assert_allclose(avg["params"]["dense"]["kernel"], 4.0)
    assert int(avg["step"]) == 5


def test_average_states_handles_bfloat16():
    import ml_dtypes
    s1, s2 = _state(1, 1.0), _state(2, 3.0)
    for s, v in ((s1, 1.0), (s2, 3.0)):
        s["params"]["bf"] = np.full((4,), v, ml_dtypes.bfloat16)
    avg = average_states([s1, s2])
    assert avg["params"]["bf"].dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(avg["params"]["bf"].astype(np.float32), 2.0)


def test_parse_epoch_spec():
    assert parse_epoch_spec("40-42,45") == [40, 41, 42, 45]
    assert parse_epoch_spec("7") == [7]
    assert parse_epoch_spec("3,1,2-3") == [1, 2, 3]
    with pytest.raises(ValueError):
        parse_epoch_spec("47-40")


def test_resolve_skips_dirs_without_checkpoints(tmp_path):
    """A ``logs/`` dir under save_path (sorts after timestamped run dirs)
    must not shadow newest-date resolution."""
    from roadseg_tpu.utils.checkpoint import Checkpointer
    run = tmp_path / "2026-01-01T00h00m00s" / "model-epoch-000.chkpt"
    run.mkdir(parents=True)
    (tmp_path / "logs").mkdir()
    ck = Checkpointer(str(tmp_path), "whatever")
    assert ck.resolve() == str(run)
    assert ck.resolve(epoch=0) == str(run)
