"""Property test for the snapshot-log replay (checkpoint._effective_states):
random append/delete/rollback histories vs a direct model.

The model recomputes every state from scratch by definition ("state after a
rollback IS the state recorded at its target"), while the implementation
replays incrementally — agreement over random logs pins the semantics
without Spark.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from nail_parquet_spark.pipeline.checkpoint import _effective_states

# op stream: "a" append, "d" delete, ("r", k) rollback to the k-th committed
# snapshot so far (1-based, valid by construction)
_ops = st.lists(
    st.one_of(
        st.just("a"), st.just("d"),
        st.tuples(st.just("r"), st.integers(min_value=1, max_value=50)),
    ),
    min_size=1, max_size=40,
)


def _build_log(ops):
    """Turn the op stream into snapshot records; rollback targets clamp to
    an existing id, and a leading rollback (no prior commit) is dropped."""
    snaps = []
    for op in ops:
        sid = len(snaps) + 1
        if op == "a":
            snaps.append({"snapshot": sid, "batch": f"b{sid}",
                          "kind": "append"})
        elif op == "d":
            snaps.append({"snapshot": sid, "batch": f"delete-{sid}",
                          "kind": "delete", "delete": sid})
        else:
            if not snaps:
                continue
            target = min(op[1], len(snaps))
            snaps.append({"snapshot": sid, "batch": f"rollback-{target}",
                          "kind": "rollback", "target": target})
    return snaps


def _model_state(snaps, upto):
    """State after record ``upto`` by direct recursion on the definition."""
    vis = []
    for s in snaps:
        if s["snapshot"] > upto:
            break
        if s["kind"] == "rollback":
            vis = _model_state(snaps, s["target"])
        else:
            vis = vis + [s["snapshot"]]
    return vis


@settings(max_examples=300, deadline=None)
@given(_ops)
def test_replay_matches_model(ops):
    snaps = _build_log(ops)
    if not snaps:
        return
    states = _effective_states(snaps)
    for s in snaps:
        assert states[s["snapshot"]] == _model_state(snaps, s["snapshot"])


@settings(max_examples=300, deadline=None)
@given(_ops)
def test_replay_invariants(ops):
    snaps = _build_log(ops)
    if not snaps:
        return
    states = _effective_states(snaps)
    by_id = {s["snapshot"]: s for s in snaps}
    for sid, vis in states.items():
        # a state never contains a rollback record, ids stay ordered and
        # unique, and every member is a real committed record <= sid
        assert all(by_id[i]["kind"] != "rollback" for i in vis)
        assert vis == sorted(set(vis))
        assert all(i <= sid for i in vis)
        # a non-rollback record is always in its own post-state
        if by_id[sid]["kind"] != "rollback":
            assert sid in vis
