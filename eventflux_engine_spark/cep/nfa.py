"""The NFA transition core, shared by batch and streaming executors.

Semantics replicated from the reference's pre/post state-processor chain
(``/root/reference/src/core/query/input/stream/state/stream_pre_state_processor.rs``):

- events replay per key in ``(ts, turn_idx)`` order
- **promote-then-match** ordering invariant: an event first advances
  instances created by *earlier* events, then may start a new instance — one
  event can match at most one position of any given instance
  (``query_parser.rs:621-626``)
- ``WITHIN`` is an event-time deadline measured from the first matched event;
  expired partial matches are dropped reactively on arrival
  (``stream_pre_state_processor.rs:282-296``)
- count quantifiers branch once ``min_count`` is reached: the instance both
  keeps accumulating and forwards a copy to the next step
  (``count_pre_state_processor.rs`` forwarding contract)
- PATTERN mode ignores non-matching events; SEQUENCE mode kills partials on
  any non-matching event (``PATTERN_PROCESSING.md:69-72``)
- without EVERY, matching stops after the first completed match

The matcher is deliberately row-sequential *within a key* — so is the
reference — but keys are independent, so Spark parallelizes across
``conv_id`` groups; the hot path for linear patterns is the vectorized
``numpy.searchsorted`` chain in :func:`match_linear_vectorized`.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from .spec import PatternSpec, Step

# instance = {"step": int, "count": int, "first_ts": int(ns),
#             "matched": list[list[event-dict]]}  (one list per step)


def _event_fields(spec: PatternSpec) -> list[str]:
    fields = {"turn_idx", spec.ts_col}
    for s in spec.steps:
        fields.update(s.emit)
        fields.update(c for _, c in s.agg_emit)
        fields.update(c for _, c in s.index_emit)
    return sorted(fields)


_COLLECTION_AGGS = {
    "sum": sum,
    "count": len,
    "min": min,
    "max": max,
    "avg": lambda xs: sum(xs) / len(xs),
}


def _effective_flags(pdf: pd.DataFrame, step: Step) -> np.ndarray:
    """Step match mask; OR steps match on either side
    (logical_pre_state_processor.rs OR semantics)."""
    f = pdf[step.flag_col].to_numpy()
    if step.logic == "or":
        return f | pdf[step.flag_col2].to_numpy()
    return f


def _emit_row(spec: PatternSpec, key: Any, matched: list[list[dict]]) -> dict:
    row: dict[str, Any] = {"conv_id": key}
    for i, s in enumerate(spec.steps):
        last = matched[i][-1]
        row[f"{s.name}_turn_idx"] = last["turn_idx"]
        # event dicts carry ts as int ns (JSON-serializable group state)
        row[f"{s.name}_ts"] = pd.Timestamp(last[spec.ts_col])
        if s.max_count > 1:
            row[f"{s.name}_count"] = len(matched[i])
        for c in s.emit:
            row[f"{s.name}_{c}"] = last[c]
        for fn, c in s.agg_emit:
            # collection aggregation over the step's matched-event chain
            # (collection_aggregation_executor.rs:141-696)
            vals = [ev[c] for ev in matched[i]]
            row[f"{s.name}_{fn}_{c}"] = _COLLECTION_AGGS[fn](vals)
        for idx, c in s.index_emit:
            # indexed chain access e1[0].x / e1[last].x
            # (indexed_variable_executor.rs:67); None past the chain end
            chain = matched[i]
            if idx == "last":
                ev = chain[-1]
            else:
                ev = chain[idx] if idx < len(chain) else None
            row[f"{s.name}_at{idx}_{c}"] = None if ev is None else ev[c]
    return row


def run_nfa(
    pdf: pd.DataFrame,
    spec: PatternSpec,
    instances: list[dict] | None = None,
    matched_done: bool = False,
) -> tuple[list[dict], list[dict], bool]:
    """Run transitions over one key's (sorted) events.

    Returns (emitted match rows, surviving instances, matched_done flag).
    ``instances`` carries partial matches across micro-batches (streaming).
    """
    instances = [
        {**inst, "and_state": inst.get("and_state", [None, None])}
        for inst in (instances or [])
    ]
    out: list[dict] = []
    if pdf.empty and not instances:
        return out, instances, matched_done

    pdf = pdf.sort_values(list(spec.order_cols), kind="mergesort")
    key = pdf[spec.key_col].iloc[0] if len(pdf) else None
    fields = _event_fields(spec)
    ts_ns = pd.to_datetime(pdf[spec.ts_col]).astype("int64").to_numpy()
    field_arrays = {f: pdf[f].to_numpy() for f in fields}
    field_arrays[spec.ts_col] = ts_ns  # keep ts as int ns inside event dicts
    flag_arrays = [_effective_flags(pdf, s) for s in spec.steps]
    side2_arrays = [
        pdf[s.flag_col2].to_numpy() if s.logic == "and" else None
        for s in spec.steps
    ]
    within_ns = int(spec.within.value) if spec.within is not None else None
    n_steps = len(spec.steps)

    def event_dict(i: int) -> dict:
        # .item() → JSON-serializable Python natives for cross-batch state
        return {f: field_arrays[f][i].item() if hasattr(field_arrays[f][i], "item") else field_arrays[f][i] for f in fields}

    def try_advance(inst: dict, row: int, ev: dict | None) -> list[dict]:
        """Apply event ``row`` to ``inst``; mutates/branches; returns
        surviving instance list (may be empty when a match completes or a
        sequence-mode miss kills it)."""
        nonlocal matched_done
        step_idx = inst["step"]
        step: Step = spec.steps[step_idx]
        if step.logic == "and":
            # AND position: one event fills at most one side; advance when
            # both sides are filled (any order) —
            # logical_pre_state_processor.rs:71
            got = inst["and_state"]
            m1 = bool(flag_arrays[step_idx][row])
            m2 = bool(side2_arrays[step_idx][row])
            filled = False
            if m1 and got[0] is None:
                got[0] = ev
                filled = True
            elif m2 and got[1] is None:
                got[1] = ev
                filled = True
            if not filled:
                if spec.mode == "sequence" and not (m1 or m2):
                    return []
                return [inst]
            if got[0] is not None and got[1] is not None:
                # fill order, completing event last (it is the step's
                # "last matched" for emit and ordering purposes)
                other = got[0] if got[1] is ev else got[1]
                inst["matched"][step_idx] = [other, ev]
                inst["and_state"] = [None, None]
                inst["step"] = step_idx + 1
                inst["count"] = 0
                if inst["step"] == n_steps:
                    out.append(_emit_row(spec, key, inst["matched"]))
                    matched_done = True
                    return []
            return [inst]
        matches = bool(flag_arrays[step_idx][row])
        if matches and step.cross_pred is not None:
            matches = bool(step.cross_pred(ev, {
                spec.steps[j].name: inst["matched"][j] for j in range(step_idx)
            }))
        if not matches:
            if spec.mode == "sequence":
                return []  # strict contiguity: partial match dies
            return [inst]

        inst["matched"][step_idx] = inst["matched"][step_idx] + [ev]
        inst["count"] += 1
        survivors: list[dict] = []
        can_advance = inst["count"] >= step.min_count
        can_stay = inst["count"] < step.max_count
        if can_stay:
            survivors.append(inst)
        if can_advance:
            fwd = inst if not can_stay else {
                "step": inst["step"],
                "count": inst["count"],
                "first_ts": inst["first_ts"],
                "matched": list(inst["matched"]),
                "and_state": [None, None],
            }
            fwd["step"] = step_idx + 1
            fwd["count"] = 0
            if fwd["step"] == n_steps:
                out.append(_emit_row(spec, key, fwd["matched"]))
                matched_done = True
            else:
                survivors.append(fwd)
        return survivors

    def any_flag(row: int) -> bool:
        if any(fa[row] for fa in flag_arrays):
            return True
        return any(sa is not None and sa[row] for sa in side2_arrays)

    step0_arm = flag_arrays[0]
    if side2_arrays[0] is not None:  # AND first step: either side arms
        step0_arm = flag_arrays[0] | side2_arrays[0]

    for row in range(len(pdf)):
        t = int(ts_ns[row])  # python int: instances must stay JSON-serializable
        # 1) reactive expiry of partials past their WITHIN deadline
        if within_ns is not None:
            instances = [
                inst for inst in instances if t - inst["first_ts"] <= within_ns
            ]
        # 2) advance instances created by earlier events (promote-then-match)
        ev = event_dict(row) if any_flag(row) else None
        nxt: list[dict] = []
        for inst in instances:
            nxt.extend(try_advance(inst, row, ev))
        instances = nxt
        # 3) possibly start a new instance at step 0
        if step0_arm[row] and (spec.every or (not matched_done and not instances)):
            fresh = {
                "step": 0,
                "count": 0,
                "first_ts": t,
                "matched": [[] for _ in range(n_steps)],
                "and_state": [None, None],
            }
            instances.extend(try_advance(fresh, row, ev))

    return out, instances, matched_done


def match_linear_block(pdf: pd.DataFrame, spec: PatternSpec) -> pd.DataFrame:
    """Vectorized linear matcher over a MULTI-KEY block sorted by
    ``(key, ts, turn_idx)``.

    Same chained-``searchsorted`` idea as :func:`match_linear_vectorized`,
    but one numpy pass covers every conversation in the block: a step-k+1
    candidate found past the conversation boundary lands in a different key
    and is discarded by the key-equality mask. This removes the per-group
    pandas overhead of grouped ``applyInPandas`` (the block is a whole task
    partition), which dominates at millions of small conversations.
    """
    assert spec.is_linear
    n = len(pdf)
    if n == 0:
        return pd.DataFrame()
    keys = pdf[spec.key_col].to_numpy()
    ts_ns = pd.to_datetime(pdf[spec.ts_col]).astype("int64").to_numpy()
    positions = [np.flatnonzero(_effective_flags(pdf, s)) for s in spec.steps]
    if any(len(p) == 0 for p in positions):
        return pd.DataFrame()

    cur = positions[0]
    chain = [cur]
    alive = np.ones(len(cur), dtype=bool)
    prev = cur
    for pos in positions[1:]:
        nxt_idx = np.searchsorted(pos, prev, side="right")
        ok = nxt_idx < len(pos)
        nxt = np.where(ok, pos[np.minimum(nxt_idx, len(pos) - 1)], -1)
        alive &= ok
        # the "first event after prev" must be in the same conversation
        safe = np.maximum(nxt, 0)
        alive &= keys[safe] == keys[chain[0]]
        chain.append(nxt)
        prev = np.where(alive, nxt, n)

    if spec.within is not None and len(chain) > 1:
        final = np.maximum(chain[-1], 0)
        alive &= (ts_ns[final] - ts_ns[chain[0]]) <= int(spec.within.value)

    sel0 = chain[0][alive]
    rows: dict[str, Any] = {"conv_id": keys[sel0]}
    for i, s in enumerate(spec.steps):
        sel = chain[i][alive]
        rows[f"{s.name}_turn_idx"] = pdf["turn_idx"].to_numpy()[sel]
        rows[f"{s.name}_ts"] = pdf[spec.ts_col].to_numpy()[sel]
        for c in s.emit:
            rows[f"{s.name}_{c}"] = pdf[c].to_numpy()[sel]
    return pd.DataFrame(rows)


def match_absent_block(
    pdf: pd.DataFrame,
    key_col: str,
    ts_col: str,
    trigger_flag: str,
    absent_flag: str,
    duration_ns: int,
    emit_cols: tuple[str, ...] = ("turn_idx",),
) -> pd.DataFrame:
    """Absent pattern ``trigger -> NOT absent FOR d``: emit each trigger
    event with NO absent-flagged event of the same key in
    ``(trigger.ts, trigger.ts + d]``.

    The reference specs this but never implemented it (needs its TimerWheel
    — ``PATTERN_PROCESSING.md:34-38``); here it is one vectorized
    searchsorted probe over a ``(key, ts)``-sorted block. Input contract ==
    :func:`match_linear_block`.
    """
    if len(pdf) == 0:
        return pd.DataFrame()
    keys = pdf[key_col].to_numpy()
    ts_ns = pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy()
    trig = np.flatnonzero(pdf[trigger_flag].to_numpy())
    if len(trig) == 0:
        return pd.DataFrame()
    absent = np.flatnonzero(pdf[absent_flag].to_numpy())
    if len(absent) == 0:
        violated = np.zeros(len(trig), dtype=bool)
    else:
        nxt_idx = np.searchsorted(absent, trig, side="right")
        have = nxt_idx < len(absent)
        nxt = absent[np.minimum(nxt_idx, len(absent) - 1)]
        same_key = keys[nxt] == keys[trig]
        in_window = ts_ns[nxt] - ts_ns[trig] <= duration_ns
        violated = have & same_key & in_window
    sel = trig[~violated]
    rows = {"conv_id": keys[sel]}
    for c in emit_cols:
        rows[c] = pdf[c].to_numpy()[sel]
    rows["ts"] = pdf[ts_col].to_numpy()[sel]
    return pd.DataFrame(rows)


def match_linear_vectorized(pdf: pd.DataFrame, spec: PatternSpec) -> pd.DataFrame:
    """Vectorized fast path for linear EVERY patterns (no quantifiers, no
    cross predicates, pattern mode): chain ``searchsorted`` lookups — each
    step-0 event pairs with the first subsequent step-1 event, etc.

    Produces byte-identical results to :func:`run_nfa` for eligible specs
    (property-tested in tests/test_cep.py).
    """
    assert spec.is_linear
    pdf = pdf.sort_values(list(spec.order_cols), kind="mergesort").reset_index(drop=True)
    key = pdf[spec.key_col].iloc[0] if len(pdf) else None
    ts_ns = pd.to_datetime(pdf[spec.ts_col]).astype("int64").to_numpy()
    positions = [np.flatnonzero(_effective_flags(pdf, s)) for s in spec.steps]
    if any(len(p) == 0 for p in positions):
        return pd.DataFrame()

    cur = positions[0]
    chain = [cur]
    alive = np.ones(len(cur), dtype=bool)
    prev = cur
    for pos in positions[1:]:
        nxt_idx = np.searchsorted(pos, prev, side="right")
        ok = nxt_idx < len(pos)
        nxt = np.where(ok, pos[np.minimum(nxt_idx, len(pos) - 1)], -1)
        alive &= ok
        chain.append(nxt)
        prev = np.where(ok, nxt, len(pdf))  # dead rows point past the end

    if spec.within is not None and len(chain) > 1:
        final = chain[-1]
        safe_final = np.maximum(final, 0)
        dur = ts_ns[safe_final] - ts_ns[chain[0]]
        alive &= dur <= int(spec.within.value)

    rows: dict[str, Any] = {"conv_id": np.repeat(key, int(alive.sum()))}
    for i, s in enumerate(spec.steps):
        sel = chain[i][alive]
        rows[f"{s.name}_turn_idx"] = pdf["turn_idx"].to_numpy()[sel]
        rows[f"{s.name}_ts"] = pdf[spec.ts_col].to_numpy()[sel]
        for c in s.emit:
            rows[f"{s.name}_{c}"] = pdf[c].to_numpy()[sel]
    return pd.DataFrame(rows)
