"""Property-based tests (hypothesis) for the pure-math core: Morton
cells, WKB round-trip, grid geometry, window histograms, salted-sum
determinism helpers. No Ray needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatial_aez_ray import cells, wkb
from spatial_aez_ray.geo import GridSpec, blklim, km2_rows
from spatial_aez_ray.pipelines.downsample import DEFAULT_BINS, window_histogram

LEVELS = st.integers(min_value=0, max_value=cells.MAX_LEVEL)


@given(level=st.integers(min_value=1, max_value=20),
       data=st.data())
@settings(max_examples=50, deadline=None)
def test_morton_roundtrip(level, data):
    n = 2 ** level
    ix = data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=20))
    iy = data.draw(st.lists(st.integers(0, n - 1), min_size=len(ix),
                            max_size=len(ix)))
    cid = cells.encode_xy(np.array(ix), np.array(iy), level)
    rx, ry, lv = cells.decode(cid)
    assert (rx == np.array(ix)).all()
    assert (ry == np.array(iy)).all()
    assert (lv == level).all()


@given(level=st.integers(min_value=2, max_value=20),
       data=st.data())
@settings(max_examples=50, deadline=None)
def test_morton_parent_halves_coords(level, data):
    n = 2 ** level
    ix = data.draw(st.integers(0, n - 1))
    iy = data.draw(st.integers(0, n - 1))
    cid = cells.encode_xy(np.array([ix]), np.array([iy]), level)
    par = cells.parent(cid)
    px, py, plv = cells.decode(par)
    assert plv[0] == level - 1
    assert px[0] == ix // 2 and py[0] == iy // 2


@given(lon=st.floats(-179.999, 179.999), lat=st.floats(-89.999, 89.999),
       level=st.integers(4, 24))
@settings(max_examples=80, deadline=None)
def test_lonlat_encode_in_range(lon, lat, level):
    cid = cells.encode_lonlat(np.array([lon]), np.array([lat]), level)
    ix, iy, lv = cells.decode(cid)
    n = 2 ** level
    assert 0 <= ix[0] < n and 0 <= iy[0] < n and lv[0] == level


@given(st.lists(
    st.lists(st.tuples(st.floats(-180, 180, allow_nan=False),
                       st.floats(-90, 90, allow_nan=False)),
             min_size=3, max_size=8),
    min_size=1, max_size=3))
@settings(max_examples=50, deadline=None)
def test_wkb_roundtrip(polys):
    geom = []
    for ring_pts in polys:
        ring = np.array(ring_pts + ring_pts[:1], dtype=np.float64)
        geom.append([ring])
    buf = wkb.dumps(geom)
    back = wkb.loads(buf)
    assert len(back) == len(geom)
    for p, q in zip(geom, back):
        assert len(p) == len(q)
        assert np.array_equal(p[0], q[0])


@given(coord=st.integers(0, 10000), blk=st.integers(1, 512),
       tot=st.integers(1, 20000))
@settings(max_examples=100, deadline=None)
def test_blklim_properties(coord, blk, tot):
    if coord >= tot:
        return
    n = blklim(coord, blk, tot)
    assert 0 < n <= blk
    assert coord + n <= tot
    # covers to the edge when clamped
    if n < blk:
        assert coord + n == tot


@given(h=st.integers(3, 30), w=st.integers(3, 30),
       seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_window_histogram_conservation(h, w, seed):
    rng = np.random.RandomState(seed)
    child = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    out = window_histogram(child, 3, DEFAULT_BINS)
    # bins partition [0,256): counts sum to 9 in every full window
    assert (out[:-1].sum(axis=0) == 9).all()


def test_km2_rows_monotone_toward_equator():
    g = GridSpec("g", 720, 360, 64)
    area = km2_rows(360, 0, g)
    # symmetric-ish and maximal at the equator rows
    mid = len(area) // 2
    assert area[mid - 1] == area.max() or area[mid] == area.max()
    assert area[0] < area[mid] and area[-1] < area[mid]


def test_aez_zones_partition_eligible_area():
    """Tier-3 invariant (SURVEY §5): with normalized slope bands, the
    232 AEZ weights sum per pixel to exactly the eligibility indicator:
    valid TMR × (four-family land use with non-barren/water soil ×
    slope total + bare/ice/urban + non-bare barren-soil)."""
    from spatial_aez_ray.pipelines import aez
    from spatial_aez_ray.constants import TMR_NAMES
    rng = np.random.RandomState(7)
    shape = (30, 30)
    kg = rng.randint(0, 32, shape).astype(np.uint8)
    # slope bands normalized to sum 100 (fixture construction)
    raw = rng.randint(1, 10, (8,) + shape)
    tot = raw.sum(axis=0)
    bands = np.floor(raw * 100 / tot).astype(np.uint8)
    bands[0] += (100 - bands.sum(axis=0)).astype(np.uint8)
    sl = [bands[i] for i in range(8)]
    lc = rng.choice([0, 10, 20, 30, 60, 80, 100, 130, 150, 190, 200,
                     210, 220, 255], shape).astype(np.uint8)
    wk = rng.randint(0, 9, shape).astype(np.uint8)

    regime = aez.populate_tmr(kg)
    slope = aez.populate_slope(sl)
    lu = aez.populate_land_use(lc)
    soil = aez.populate_soil_health(wk)

    total = np.zeros(shape)
    for tmr in TMR_NAMES:
        for z in aez.yield_aezs(regime, tmr, slope, lu, soil):
            total = total + z

    valid = np.zeros(shape, dtype=bool)
    for tmr in TMR_NAMES:
        valid |= regime[tmr]
    fam4 = (lu["forest"] | lu["grassland"] | lu["cropland_irrigated"]
            | lu["cropland_rainfed"])
    soil_pgm = soil["prime"] | soil["good"] | soil["marginal"]
    slope_sum = slope["minimal"] + slope["moderate"] + slope["steep"]
    bare3 = lu["bare"] | lu["ice"] | lu["urban"]
    expected = valid * ((fam4 & soil_pgm) * slope_sum
                        + bare3 + (~bare3 & soil["barren"]))
    assert np.allclose(total, expected, atol=1e-12)


@given(h=st.integers(1, 80), w=st.integers(1, 80),
       rps=st.integers(1, 90), seed=st.integers(0, 2**31 - 1),
       palette=st.booleans())
@settings(max_examples=40, deadline=None)
def test_geotiff_roundtrip_property(h, w, rps, seed, palette):
    import tempfile
    from spatial_aez_ray.sources import geotiff
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    cm = rng.randint(0, 256, size=(256, 3), dtype=np.uint8) if palette \
        else None
    tmp = tempfile.mkdtemp(prefix="tifprop")
    p = f"{tmp}/t{seed}.tif"
    geotiff.write_geotiff(p, arr, color_map=cm, rows_per_strip=rps)
    gt = geotiff.read_geotiff(p)
    assert (gt.array == arr).all()
    if palette:
        assert (gt.color_map == cm).all()
    else:
        assert gt.color_map is None


@given(h=st.integers(1, 60), w=st.integers(1, 60),
       seed=st.integers(0, 2**31 - 1), palette=st.booleans())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, seed, palette):
    from spatial_aez_ray.functions.png import decode_png, encode_png
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8) if palette \
        else None
    a2, p2 = decode_png(encode_png(arr, pal))
    assert (a2 == arr).all()
    assert (p2 is None) == (pal is None)
    if pal is not None:
        assert (p2 == pal).all()


@given(n_polys=st.integers(1, 4), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_shp_roundtrip_property(n_polys, seed):
    import tempfile
    from spatial_aez_ray.sources import shapefile
    rng = np.random.RandomState(seed)
    geoms = []
    for _ in range(n_polys):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        r = rng.uniform(0.5, 5.0)
        # CW outer ring (shapefile convention)
        ring = np.array([(cx - r, cy - r), (cx - r, cy + r),
                         (cx + r, cy + r), (cx + r, cy - r),
                         (cx - r, cy - r)], dtype=np.float64)
        geoms.append([[ring]])
    p = f"{tempfile.mkdtemp(prefix='shpprop')}/s{seed}.shp"
    shapefile.write_shp(p, geoms)
    back = shapefile.read_shp(p)
    assert len(back) == len(geoms)
    for g, b in zip(geoms, back):
        assert len(b) == 1 and len(b[0]) == 1
        assert (b[0][0] == g[0][0]).all()


# ---------------------------------------------------------------------------
# datapipe pure-math properties (no Ray): chunking arithmetic, KMV
# sketch merge laws, bloom filter guarantees
# ---------------------------------------------------------------------------

@given(n_toks=st.integers(1, 500), chunk=st.integers(2, 64),
       data=st.data())
@settings(max_examples=60, deadline=None)
def test_chunking_covers_every_token_exactly(n_toks, chunk, data):
    """The chunk grid [k*stride, k*stride+chunk) must cover each token
    index, with indices in overlap zones covered by exactly the
    expected number of windows."""
    stride = data.draw(st.integers(1, chunk))
    starts = list(range(0, n_toks, stride))
    cover = np.zeros(n_toks, dtype=int)
    for s in starts:
        cover[s:s + chunk] += 1
    assert (cover >= 1).all()
    # a token at index i is inside window k iff k*stride <= i < k*stride+chunk
    want = [len([s for s in starts if s <= i < s + chunk])
            for i in range(n_toks)]
    assert (cover == np.array(want)).all()


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=400),
       split=st.integers(0, 400), k=st.integers(2, 32))
@settings(max_examples=60, deadline=None)
def test_kmv_merge_is_order_independent(keys, split, k):
    """Merging per-partition KMV sketches (k smallest distinct hashes)
    must equal the sketch of the union, for any split point — the
    mergeability law the distributed aggregate relies on."""
    from spatial_aez_ray.datapipe.dedup import _h64u
    h = np.array(sorted({_h64u(str(kk)) >> 32 for kk in keys}),
                 dtype=np.int64)
    a = keys[:min(split, len(keys))]
    b = keys[min(split, len(keys)):]
    sa = np.array(sorted({_h64u(str(kk)) >> 32 for kk in a}),
                  dtype=np.int64)[:k]
    sb = np.array(sorted({_h64u(str(kk)) >> 32 for kk in b}),
                  dtype=np.int64)[:k]
    merged = np.unique(np.concatenate([sa, sb]))[:k]
    assert (merged == h[:k]).all()


@given(seed=st.integers(0, 1000), n=st.integers(1, 300))
@settings(max_examples=40, deadline=None)
def test_bloom_no_false_negatives_property(seed, n):
    from spatial_aez_ray.datapipe import relational
    rng = np.random.RandomState(seed)
    keys = rng.randint(0, 1 << 40, size=n).astype(np.int64)
    words = np.zeros(relational._BLOOM_BITS // 64, dtype=np.uint64)
    pos = relational._bloom_positions(keys).ravel()
    np.bitwise_or.at(words, pos >> np.uint64(6),
                     np.uint64(1) << (pos & np.uint64(63)))
    assert relational._bloom_test(words, keys).all()


@given(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1))
def test_zorder_interleave_bijective(a, b):
    from spatial_aez_ray.datapipe.relational import ZORDER_BITS, _z_interleave
    x = np.array([a & 0xFFFF], dtype=np.int64)
    y = np.array([b & 0xFFFF], dtype=np.int64)
    z = int(_z_interleave(x, y)[0])
    xa = sum(((z >> (2 * i)) & 1) << i for i in range(ZORDER_BITS))
    ya = sum(((z >> (2 * i + 1)) & 1) << i for i in range(ZORDER_BITS))
    assert (xa, ya) == (int(x[0]), int(y[0]))


@given(st.integers(0, 10**6))
def test_mode_reduce2_window_properties(seed):
    from spatial_aez_ray.pipelines.pyramid import mode_reduce2
    rng = np.random.RandomState(seed % (2**32))
    m = rng.randint(0, 5, size=(8, 8)).astype(np.uint8)
    out = mode_reduce2(m, nodata=0)
    for i in range(4):
        for j in range(4):
            win = m[2*i:2*i+2, 2*j:2*j+2].ravel()
            got = out[i, j]
            nz = win[win != 0]
            if len(nz) == 0:
                assert got == 0
            else:
                # winner must be a most-frequent nonzero value, and
                # the smallest among equally-frequent winners
                vals, cnts = np.unique(nz, return_counts=True)
                best = vals[cnts == cnts.max()].min()
                assert got == best


@given(st.lists(st.integers(0, 255), min_size=1, max_size=12, unique=True),
       st.integers(1, 1000))
def test_equalize_lut_monotone(bins, scale):
    from spatial_aez_ray.pipelines.downsample import equalize_lut
    h = np.zeros(256, dtype=np.int64)
    for i, b in enumerate(bins):
        h[b] = (i + 1) * scale
    lut = equalize_lut(h, nodata=0)
    occ = sorted(b for b in bins if b != 0)
    vals = [int(lut[b]) for b in occ]
    assert vals == sorted(vals)           # monotone over occupied bins
    if len(occ) > 1:
        # top of the stretch; a single-distinct-value histogram is
        # degenerate (den = 0) and maps to 0 by convention
        assert vals[-1] == 255
    assert lut[0] == 0                    # nodata preserved


@given(st.integers(0, 10**6))
def test_mercator_index_in_bounds_and_monotone(seed):
    from spatial_aez_ray.geo import GridSpec
    from spatial_aez_ray.pipelines.warp import mercator_src_index
    rng = np.random.RandomState(seed % (2**32))
    grid = GridSpec("g", 720, 360, 64)
    n = 256
    rows = np.sort(rng.uniform(0, n - 1, size=16))
    cols = rng.uniform(0, n - 1, size=16)
    r, c = mercator_src_index(grid, n, rows, cols)
    assert ((r >= 0) & (r < grid.height)).all()
    assert ((c >= 0) & (c < grid.width)).all()
    # Mercator y grows south: source rows are nondecreasing in out row
    assert (np.diff(r) >= 0).all()


# ---------------------------------------------------------------------------
# round-4 late additions: labeling + edit-distance kernels
# ---------------------------------------------------------------------------

def _flood_fill_labels(arr, bg):
    """Brute-force reference: BFS flood fill, label = min flat index."""
    h, w = arr.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    seen = np.zeros((h, w), dtype=bool)
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx] or arr[sy, sx] == bg:
                continue
            comp, stack = [], [(sy, sx)]
            seen[sy, sx] = True
            while stack:
                y, x = stack.pop()
                comp.append((y, x))
                for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                    if (0 <= ny < h and 0 <= nx < w and not seen[ny, nx]
                            and arr[ny, nx] == arr[y, x]):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            root = min(y * w + x for y, x in comp)
            for y, x in comp:
                lab[y, x] = root
    return lab


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 32 - 1))
def test_label_components_matches_flood_fill(h, w, seed):
    from spatial_aez_ray.pipelines.regions import label_components
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 4, size=(h, w)).astype(np.uint8)  # 0 = bg
    got = label_components(arr, 0)
    ref = _flood_fill_labels(arr, 0)
    assert (got == ref).all()


def _levenshtein_ref(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc", max_size=6), st.text(alphabet="abc", max_size=6))
def test_ed_le1_matches_levenshtein(a, b):
    from spatial_aez_ray.datapipe.dedup import _ed_le1
    assert _ed_le1(a, b) == (_levenshtein_ref(a, b) <= 1)


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(st.text(alphabet="ab", min_size=1, max_size=5),
                       st.integers(1, 9), min_size=1, max_size=8),
       st.integers(0, 6))
def test_bpe_apply_lossless_any_merges(wc, n_merges):
    from spatial_aez_ray.datapipe.corpus import bpe_apply, bpe_train_merges
    merges = bpe_train_merges(wc, n_merges)
    for w in wc:
        toks = bpe_apply(w, merges)
        assert "".join(toks) == w
        assert all(t for t in toks)


@given(st.lists(st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
                min_size=0, max_size=200),
       st.integers(1, 5))
@settings(max_examples=50, deadline=None)
def test_skyline_matches_bruteforce_and_partition_invariance(pts, nparts):
    """_skyline_2d == O(n²) dominance filter on distinct pairs, and
    skyline(union of per-part skylines) == skyline(all) — the
    correctness core of the distributed shape."""
    from spatial_aez_ray.datapipe.relational import _skyline_2d
    c = np.array([p[0] for p in pts], dtype=np.int64)
    d = np.array([p[1] for p in pts], dtype=np.int64)
    got = list(zip(*_skyline_2d(c, d)))
    uniq = set(pts)
    want = sorted(
        (a, b) for a, b in uniq
        if not any((x <= a and y <= b and (x < a or y < b))
                   for x, y in uniq))
    assert got == want
    # partition invariance
    parts = [([], []) for _ in range(nparts)]
    for i, p in enumerate(pts):
        parts[i % nparts][0].append(p[0])
        parts[i % nparts][1].append(p[1])
    merged_c, merged_d = [], []
    for pc, pd_ in parts:
        sc, sd = _skyline_2d(np.array(pc, np.int64),
                             np.array(pd_, np.int64))
        merged_c.extend(sc)
        merged_d.extend(sd)
    got2 = list(zip(*_skyline_2d(np.array(merged_c, np.int64),
                                 np.array(merged_d, np.int64))))
    assert got2 == want


@given(st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=300),
       st.integers(1, 6))
@settings(max_examples=50, deadline=None)
def test_bottomk_sample_merge_invariance(keys, nparts):
    """Bottom-k-of-union == merge of per-partition bottom-k for any
    split — the mergeable-summary property sample_quantiles rests on."""
    from spatial_aez_ray.datapipe.dedup import _h64u
    k = 16
    h = np.array([_h64u(str(v)) for v in keys], dtype=np.uint64)
    ks = np.array(keys, dtype=np.int64)
    direct = ks[np.lexsort((ks, h))][:k]
    merged_h, merged_k = [], []
    for i in range(nparts):
        hh, kk = h[i::nparts], ks[i::nparts]
        o = np.lexsort((kk, hh))[:k]
        merged_h.extend(hh[o])
        merged_k.extend(kk[o])
    mh = np.array(merged_h, dtype=np.uint64)
    mk = np.array(merged_k, dtype=np.int64)
    got = mk[np.lexsort((mk, mh))][:k]
    assert (got == direct).all()


@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
       st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
       st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=100, deadline=None)
def test_flowdir_agrees_with_float_argmax(a, b, c, d, e, f, g, h, i):
    """Integer cross-multiplied slope comparison == float steepest
    descent whenever the float slopes are not exactly tied."""
    import math
    from spatial_aez_ray.pipelines.pyramid import flowdir_codes
    pad = np.array([[a, b, c], [d, e, f], [g, h, i]], np.uint8)
    code = flowdir_codes(pad)[0, 0]
    order = [((1, 2), 1, 1.0), ((2, 2), 2, math.sqrt(2)),
             ((2, 1), 4, 1.0), ((2, 0), 8, math.sqrt(2)),
             ((1, 0), 16, 1.0), ((0, 0), 32, math.sqrt(2)),
             ((0, 1), 64, 1.0), ((0, 2), 128, math.sqrt(2))]
    best_code, best_slope = 0, 0.0
    vals = pad.astype(int)
    for (dy, dx), cd, dist in order:
        drop = int(e) - int(vals[dy, dx])
        if drop <= 0:
            continue
        s = drop / dist
        if s > best_slope + 1e-9:
            best_slope, best_code = s, cd
    # only assert when no near-tie ambiguity exists in float space
    ties = [abs((int(e) - int(vals[dy, dx])) / dist - best_slope) < 1e-9
            for (dy, dx), _cd, dist in order
            if int(e) - int(vals[dy, dx]) > 0]
    if sum(ties) <= 1:
        assert code == best_code
