"""Distributed seam-state machinery for the hydro fixpoints.

The hydro family's global-propagation kernels (flow accumulation,
Strahler orders, the cost/fill min-plus family) iterate block-Jacobi
rounds: each round re-runs exactly the tiles whose boundary INFLOW
changed and exchanges O(tile edge) seam rows. The default fold keeps
the per-round state in a driver dict + ``ray.put`` broadcast
(``hydro._accum_fixpoint`` / ``_min_seam_fixpoint``) — bounded and
fast at sandbox scale but O(total seam pixels) driver memory: at the
planetary 300 m grid (~130 k tiles x 256-px seams ~ 1e8 seam rows)
that dict is tens of GB. Above ``SEAM_DRIVER_MAX_ROWS`` estimated
seam rows (or under the test override ``FORCE_MODE``) the SAME round
structure runs here with every seam-sized object distributed:

* the current out rows and the aggregated inflow are materialized
  Ray Datasets (object store, spillable);
* the fold is a per-batch vectorized pre-reduce + one coarse-
  partitioned ``groupby(key % W).map_groups`` (the LSH bucket-fold
  discipline — never one Ray group per tiny key);
* change detection is an EXACT signed diff: concat(new +1, old -1),
  sum sign and sign*value per key — a key's aggregated value changed
  iff either sum is nonzero (int64, no hashing, no collisions);
* per-tile inflow travels to the kernels INSIDE the work Dataset as
  list columns (co-partitioned delivery), not a driver dict.

Driver memory drops to O(#pending tiles) (the id list the driver
path also holds). The pending set each round equals the driver
path's exactly (the diff is per (pixel, value), the same predicate
``new_inflow.get(t) != inflow.get(t)`` evaluates), so the round
structure — and therefore every kernel input and the converged
inflow — is bit-identical to the driver path by construction;
``tests/test_hydro.py`` forces this path and asserts frame equality.

Keys pack ``dst_tile << 31 | px`` into one int64 (px < 2^31 for any
tile <= 46341 px square; dst < 2^32 asserted) — the CLAUDE.md
two-int32-keys-in-one-int64 groupby discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..datapipe.util import coarse_fold_width

_PX_BITS = 31
_PX_MASK = np.int64((1 << _PX_BITS) - 1)

#: estimated total seam rows (present_tiles x 4 edges x tile px) above
#: which the driver fold would hold multi-GB dicts; the scale-80 bench
#: world (~101 k tiles x 256) estimates ~1e8 and stays on the driver
#: path — this guard is the 100 TB swap-in, not a sandbox tuning.
SEAM_DRIVER_MAX_ROWS = 500_000_000

#: tests monkeypatch: True forces the distributed path everywhere,
#: False forces the driver path, None = threshold decision.
FORCE_MODE: bool | None = None


def use_distributed(present_tiles, grid) -> bool:
    if FORCE_MODE is not None:
        return FORCE_MODE
    return len(present_tiles) * 4 * grid.tile > SEAM_DRIVER_MAX_ROWS


def _pack_key(dst: np.ndarray, px: np.ndarray) -> np.ndarray:
    if len(dst) and int(dst.max()) >= (1 << 32):
        raise AssertionError("tile id overflows the 64-bit seam key")
    return (dst.astype(np.int64) << _PX_BITS) | px.astype(np.int64)


class DistInflow:
    """Aggregated seam inflow held as a Dataset of ``(key, v1[, v2])``
    rows (``key = dst << 31 | px``); ``ds`` may be None (empty). The
    hydro ``run`` launchers recognize this wrapper and deliver inflow
    to the kernels as list columns in the work Dataset instead of a
    ``ray.put`` driver dict."""

    def __init__(self, ds, *, two_vals: bool = False):
        self.ds = ds
        self.two_vals = two_vals

    def work_ds(self, tile_ids, extra: list[tuple[str, "DistInflow"]]
                | None = None):
        specs = [("in", self.ds, self.two_vals)]
        for tag, other in (extra or []):
            specs.append((tag, other.ds, other.two_vals))
        return pack_work(tile_ids, specs)


def pack_work(tile_ids, specs):
    """Work Dataset for one kernel pass: one row per tile in
    ``tile_ids`` with, per (tag, inflow_ds, two_vals) spec, list
    columns ``{tag}_px``, ``{tag}_v1`` (and ``{tag}_v2``) holding that
    tile's inflow — empty lists where the tile has none. Inflow rows
    are filtered to the requested tiles by a broadcast sorted id
    array, then coarse-folded (``key % W``) so the per-tile packing
    never creates one Ray group per tile."""
    width = coarse_fold_width()
    pend = np.asarray(sorted(int(t) for t in tile_ids), dtype=np.int64)
    pend_ref = ray.put(pend)
    zeros = np.zeros(len(pend), dtype=np.int64)
    parts = [ray.data.from_arrow(pa.table({
        "dst": pa.array(pend), "px": pa.array(zeros),
        "v1": pa.array(zeros), "v2": pa.array(zeros),
        "tagi": pa.array(np.full(len(pend), -1, dtype=np.int64)),
        "coarse": pa.array(pend % width)}))]

    def conform(ti, two):
        def fn(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy(zero_copy_only=False)
            dst = key >> _PX_BITS
            keep = np.isin(dst, ray.get(pend_ref))
            key, dst = key[keep], dst[keep]
            v1 = b["v1"].to_numpy(zero_copy_only=False)[keep]
            v2 = (b["v2"].to_numpy(zero_copy_only=False)[keep]
                  if two else np.zeros(len(key), dtype=np.int64))
            return pa.table({
                "dst": pa.array(dst), "px": pa.array(key & _PX_MASK),
                "v1": pa.array(v1), "v2": pa.array(v2),
                "tagi": pa.array(np.full(len(key), ti, dtype=np.int64)),
                "coarse": pa.array(dst % width)})
        return fn

    tags = []
    for ti, (tag, ds, two) in enumerate(specs):
        tags.append((tag, two))
        if ds is not None:
            parts.append(ds.map_batches(conform(ti, two),
                                        batch_format="pyarrow"))
    work = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return (work.groupby("coarse")
            .map_groups(_make_packer(tags), batch_format="pandas"))


def _make_packer(tags):
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        dst = g["dst"].to_numpy(np.int64)
        px = g["px"].to_numpy(np.int64)
        v1 = g["v1"].to_numpy(np.int64)
        v2 = g["v2"].to_numpy(np.int64)
        tagi = g["tagi"].to_numpy(np.int64)
        order = np.lexsort((px, tagi, dst))
        dst, px, v1, v2, tagi = (dst[order], px[order], v1[order],
                                 v2[order], tagi[order])
        uids, starts = np.unique(dst, return_index=True)
        bounds = np.r_[starts, len(dst)]
        cols: dict[str, list] = {}
        for tag, two in tags:
            cols[f"{tag}_px"] = []
            cols[f"{tag}_v1"] = []
            if two:
                cols[f"{tag}_v2"] = []
        for i in range(len(uids)):
            sl = slice(bounds[i], bounds[i + 1])
            t_ = tagi[sl]
            for ti, (tag, two) in enumerate(tags):
                m = t_ == ti
                cols[f"{tag}_px"].append(px[sl][m])
                cols[f"{tag}_v1"].append(v1[sl][m])
                if two:
                    cols[f"{tag}_v2"].append(v2[sl][m])
        out = pd.DataFrame({"id": uids})
        for k, v in cols.items():
            out[k] = pd.Series(v, dtype=object)
        return out
    return pack


def unpack_inflow(b: pa.Table, tag: str, *, two_vals: bool = False):
    """Kernel-side twin of ``pack_work``: rebuild the per-tile inflow
    dicts (``{tile: {px: v}}`` or ``{tile: {px: (v1, v2)}}`` — the
    exact shape the driver-path broadcast holds) from the work batch's
    list columns. Returns None when the batch has no such columns
    (driver mode), so kernels can fall back to their broadcast."""
    if f"{tag}_px" not in b.column_names:
        return None
    ids = b["id"].to_numpy(zero_copy_only=False)
    pxs = b[f"{tag}_px"].to_pylist()
    v1s = b[f"{tag}_v1"].to_pylist()
    v2s = b[f"{tag}_v2"].to_pylist() if two_vals else None
    out: dict[int, dict] = {}
    for i, tid in enumerate(ids):
        # rows may arrive as Python lists, numpy arrays (the
        # variable-shaped tensor extension pandas->arrow takes), or
        # None (empty lists null out through that extension)
        if pxs[i] is not None and len(pxs[i]):
            if two_vals:
                out[int(tid)] = {int(p): (int(a), int(c)) for p, a, c
                                 in zip(pxs[i], v1s[i], v2s[i])}
            else:
                out[int(tid)] = {int(p): int(a)
                                 for p, a in zip(pxs[i], v1s[i])}
    return out


# ------------------------------------------------------- aggregation

def _prereduce_sum(b: pa.Table) -> pa.Table:
    key = _pack_key(b["dst"].to_numpy(zero_copy_only=False),
                    b["px"].to_numpy(zero_copy_only=False))
    v = b["flux"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    uk, starts = np.unique(key, return_index=True)
    sums = np.add.reduceat(v, starts) if len(v) else v
    return pa.table({"key": pa.array(uk), "v1": pa.array(sums),
                     "coarse": pa.array((uk >> _PX_BITS)
                                        % coarse_fold_width())})


def _prereduce_min(b: pa.Table) -> pa.Table:
    key = _pack_key(b["dst"].to_numpy(zero_copy_only=False),
                    b["px"].to_numpy(zero_copy_only=False))
    v = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    uk, starts = np.unique(key, return_index=True)
    mins = np.minimum.reduceat(v, starts) if len(v) else v
    return pa.table({"key": pa.array(uk), "v1": pa.array(mins),
                     "coarse": pa.array((uk >> _PX_BITS)
                                        % coarse_fold_width())})


def _strahler_partial(key, ordv, k):
    """(key, max order, count summed at that max) partials — the
    (max, count-at-max) commutative monoid the strahler seam rows
    merge under, vectorized per segment."""
    order = np.lexsort((ordv, key))
    key, ordv, k = key[order], ordv[order], k[order]
    uk, starts = np.unique(key, return_index=True)
    ends = np.r_[starts[1:], len(key)] - 1
    mo = ordv[ends]
    at_max = k * (ordv == np.repeat(mo, np.diff(np.r_[starts, len(key)])))
    ksum = np.add.reduceat(at_max, starts) if len(key) else at_max
    return uk, mo, ksum


def _prereduce_strahler(b: pa.Table) -> pa.Table:
    key = _pack_key(b["dst"].to_numpy(zero_copy_only=False),
                    b["px"].to_numpy(zero_copy_only=False))
    ordv = b["ord"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    uk, mo, ksum = _strahler_partial(key, ordv, k)
    return pa.table({"key": pa.array(uk), "v1": pa.array(mo),
                     "v2": pa.array(ksum),
                     "coarse": pa.array((uk >> _PX_BITS)
                                        % coarse_fold_width())})


def _finish_sum(g: pd.DataFrame) -> pd.DataFrame:
    key = g["key"].to_numpy(np.int64)
    v = g["v1"].to_numpy(np.int64)
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    uk, starts = np.unique(key, return_index=True)
    return pd.DataFrame({"key": uk, "v1": np.add.reduceat(v, starts)})


def _finish_min(g: pd.DataFrame) -> pd.DataFrame:
    key = g["key"].to_numpy(np.int64)
    v = g["v1"].to_numpy(np.int64)
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    uk, starts = np.unique(key, return_index=True)
    return pd.DataFrame({"key": uk, "v1": np.minimum.reduceat(v, starts)})


def _finish_strahler(g: pd.DataFrame) -> pd.DataFrame:
    uk, mo, ksum = _strahler_partial(g["key"].to_numpy(np.int64),
                                     g["v1"].to_numpy(np.int64),
                                     g["v2"].to_numpy(np.int64))
    return pd.DataFrame({"key": uk, "v1": mo, "v2": ksum})


_KINDS = {
    "sum": (_prereduce_sum, _finish_sum, False),
    "min": (_prereduce_min, _finish_min, False),
    "strahler": (_prereduce_strahler, _finish_strahler, True),
}


def aggregate_inflow(out_ds, kind: str):
    """Fold the full out-row Dataset into one aggregated inflow row
    per (dst, px) key: SUM (flow accumulation), MIN (cost/fill), or
    the strahler (max order, count-at-max) monoid. Per-batch
    vectorized pre-reduce, then one coarse-partitioned map_groups —
    both stages merge the same monoid, so grouping order is free."""
    pre, fin, _two = _KINDS[kind]
    agg = (out_ds.map_batches(pre, batch_format="pyarrow")
           .groupby("coarse")
           .map_groups(fin, batch_format="pandas")
           .materialize())
    return agg if agg.count() else None


def changed_dsts(new_ds, old_ds, *, two_vals: bool) -> list[int]:
    """EXACT symmetric diff of two aggregated inflow Datasets (each
    holds <= 1 row per key): dst tiles where any key appeared,
    vanished, or changed value. concat with sign +1/-1; per key the
    sums of sign, sign*v1 (and sign*v2) are all zero iff both sides
    agree — pure int64 linear algebra, no hash, no collision."""
    width = coarse_fold_width()

    def signed(sign):
        def fn(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy(zero_copy_only=False)
            v1 = b["v1"].to_numpy(zero_copy_only=False)
            v2 = (b["v2"].to_numpy(zero_copy_only=False) if two_vals
                  else np.zeros(len(key), dtype=np.int64))
            s = np.full(len(key), sign, dtype=np.int64)
            return pa.table({"key": pa.array(key),
                             "sn": pa.array(s),
                             "sv1": pa.array(s * v1),
                             "sv2": pa.array(s * v2),
                             "coarse": pa.array((key >> _PX_BITS)
                                                % width)})
        return fn

    parts = []
    if new_ds is not None:
        parts.append(new_ds.map_batches(signed(1),
                                        batch_format="pyarrow"))
    if old_ds is not None:
        parts.append(old_ds.map_batches(signed(-1),
                                        batch_format="pyarrow"))
    if not parts:
        return []
    ds = parts[0] if len(parts) == 1 else parts[0].union(parts[1])

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(np.int64)
        order = np.argsort(key, kind="stable")
        key = key[order]
        uk, starts = np.unique(key, return_index=True)
        tot = np.zeros((len(uk), 3), dtype=np.int64)
        for j, c in enumerate(("sn", "sv1", "sv2")):
            tot[:, j] = np.add.reduceat(
                g[c].to_numpy(np.int64)[order], starts)
        changed = (tot != 0).any(axis=1)
        return pd.DataFrame({
            "dst": np.unique(uk[changed] >> _PX_BITS)})

    rows = (ds.groupby("coarse")
            .map_groups(diff, batch_format="pandas")
            .to_pandas())
    if rows.empty:  # all-empty groups lose the schema entirely
        return []
    return sorted(int(d) for d in
                  np.unique(rows["dst"].to_numpy(np.int64)))


def fixpoint(run, present_tiles, *, kind: str, what: str,
             max_rounds: int):
    """Distributed twin of ``hydro._accum_fixpoint`` /
    ``_min_seam_fixpoint`` / the inline strahler fold: identical
    pending sets each round (the diff is exact), seam-sized state
    never on the driver. ``run(tile_ids, DistInflow, final=False)``
    must return the seam-row Dataset. Returns (DistInflow, rounds)."""
    two = _KINDS[kind][2]
    out_ds = None
    inflow = DistInflow(None, two_vals=two)
    pending = sorted(int(t) for t in present_tiles)
    rounds = 0
    while pending:
        rounds += 1
        if rounds > max_rounds:
            raise AssertionError(
                f"{what} distributed seam fixpoint did not converge "
                f"within {max_rounds} rounds")
        new_rows = run(pending, inflow, final=False).materialize()
        if out_ds is None:
            out_ds = new_rows
        else:
            pend_ref = ray.put(np.asarray(pending, dtype=np.int64))

            def drop_pending(b: pa.Table) -> pa.Table:
                keep = ~np.isin(b["src"].to_numpy(zero_copy_only=False),
                                ray.get(pend_ref))
                return b.filter(pa.array(keep))

            out_ds = (out_ds.map_batches(drop_pending,
                                         batch_format="pyarrow")
                      .union(new_rows).materialize())
        new_inflow = (aggregate_inflow(out_ds, kind)
                      if out_ds.count() else None)
        pending = changed_dsts(new_inflow, inflow.ds, two_vals=two)
        inflow = DistInflow(new_inflow, two_vals=two)
    return inflow, rounds


# ---------------------------------------------------- seam-ring chases

def chase_resolve(ring_ds, *, cross: int, max_iters: int = 16):
    """Distributed pointer doubling over a seam ring graph — the
    100 TB form of the watershed / flow-length driver chases (their
    memoized dict holds one entry per ring pixel = O(world
    perimeter)). Rows: ``(node, s, cls, aux)`` where ``cls == cross``
    means "crossing a seam into ring pixel ``aux``" and anything else
    is terminal; ``s`` is the static in-tile offset of ``node``.
    Maintains per row an accumulated offset ``acc`` with the
    invariant  total(node) = s + acc + T(cls, aux),
    T(cross, a) = 1 + s_a + acc_a + T(...), T(terminal) = caller's
    constant — one join per iteration SQUARES the resolved chase
    depth (strictly-downhill D8 bounds chases at 255 seams, so <= 9
    iterations). Returns the materialized all-terminal Dataset
    ``(node, s, cls, aux, acc)``; resolution is function application,
    so results are bit-identical to the sequential chase."""
    from ..datapipe.util import shuffle_width

    def init(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"], "s": b["s"], "cls": b["cls"],
            "aux": b["aux"],
            "acc": pa.array(np.zeros(len(b), dtype=np.int64))})

    r = ring_ds.map_batches(init, batch_format="pyarrow").materialize()
    width = shuffle_width(blocks=r.num_blocks())
    for _ in range(max_iters):
        pending = r.filter(expr=f"cls == {int(cross)}")
        if pending.count() == 0:
            return r
        done = r.filter(expr=f"cls != {int(cross)}")

        def rename(b: pa.Table) -> pa.Table:
            return pa.table({"node2": b["node"], "s2": b["s"],
                             "cls2": b["cls"], "aux2": b["aux"],
                             "acc2": b["acc"]})

        target = r.map_batches(rename, batch_format="pyarrow")
        joined = pending.join(target, join_type="inner",
                              num_partitions=width,
                              on=("aux",), right_on=("node2",))

        def jump(b: pa.Table) -> pa.Table:
            acc = (b["acc"].to_numpy(zero_copy_only=False)
                   + 1 + b["s2"].to_numpy(zero_copy_only=False)
                   + b["acc2"].to_numpy(zero_copy_only=False))
            return pa.table({
                "node": b["node"], "s": b["s"], "cls": b["cls2"],
                "aux": b["aux2"], "acc": pa.array(acc)})

        r = (done.union(joined.map_batches(jump,
                                           batch_format="pyarrow"))
             .materialize())
    if r.filter(expr=f"cls == {int(cross)}").count():
        raise AssertionError(
            "seam-ring chase did not terminate (cyclic flow?)")
    return r
