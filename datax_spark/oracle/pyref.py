"""Pure-Python reference implementations for the non-SQL-expressible
operators, plus a VALUES-literal SQL emitter so DuckDB can check them.

Each ``*_rows`` function recomputes the operator's expected output from
the raw parquet inputs using ONLY this package's xxh64 + the published
algorithm definitions (MinHash banding, SimHash bit-sums, random
hyperplane LSH, the multimodal stub math) — no Spark, no engine imports.
``__spark_entry__.oracle_sql()`` turns the rows into
``SELECT ... FROM (VALUES ...)`` strings for the driver's DuckDB gate.

Text normalization mirrors the engine's JVM expressions bit-for-bit:
Java ``\\s`` is ASCII-only ``[ \\t\\n\\x0B\\f\\r]`` (Python's ``\\s`` is
Unicode-wide — do NOT use it here), ``F.trim`` strips ASCII spaces, and
all float reductions are sequential left folds exactly like
``F.aggregate``. Rounding replicates Spark's HALF_UP-on-shortest-repr
(``BigDecimal.valueOf(double).setScale(n, HALF_UP)``).
"""

from __future__ import annotations

import functools
import math
import re
from decimal import ROUND_HALF_UP, Decimal

from datax_spark.oracle.xxh64 import spark_xxhash64

_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _normalize(text: str) -> str:
    """lower(trim(regexp_replace(text, \\s+, ' '))) with Java semantics."""
    return _JAVA_WS.sub(" ", text).strip(" ").lower()


def _words(text: str) -> list[str]:
    return _normalize(text).split(" ")


def _shingles(text: str, k: int = 3) -> list[str]:
    w = _words(text)
    if len(w) >= k:
        return [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
    return [" ".join(w)]


def _round_half_up(x: float, n: int) -> float:
    """Spark F.round on double: HALF_UP over the shortest decimal repr."""
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _load_pandas(sf_dir: str, name: str):
    import os

    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet")).to_pandas()


# ------------------------------------------------------------ fingerprint

def fingerprint_rows(sf_dir: str) -> list[tuple]:
    """(doc_id, fp) — xxhash64 over normalized-lowered text (engine:
    functions/text.py::fingerprint64)."""
    docs = _load_pandas(sf_dir, "documents")
    return [
        (int(r.doc_id), spark_xxhash64(("str", _normalize(r.text))))
        for r in docs.itertuples()
    ]


# ----------------------------------------------------------- minhash LSH

def minhash_pairs_rows(
    sf_dir: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> list[tuple]:
    """(id_a, id_b, jaccard_est) — banded MinHash candidate pairs
    (engine: operators/dedup.py::minhash_lsh_pairs). Hash family: base =
    xxhash64(shingle string); permutation j = xxhash64(base_long, j)."""
    sigs, buckets = _minhash_index(sf_dir, k_shingle, num_hashes, bands)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / num_hashes
        if est >= threshold:
            out.append((a, b, est))
    return out


# --------------------------------------------------------------- simhash

def simhash_rows(sf_dir: str) -> list[tuple]:
    """(id, simhash) — 63-bit sign-sum SimHash over whitespace tokens
    (engine: operators/dedup.py::simhash64; bit 63 skipped there too)."""
    docs = _load_pandas(sf_dir, "documents")
    out = []
    for r in docs.itertuples():
        sums = [0] * 63
        for w in _words(r.text):
            h = spark_xxhash64(("str", w))
            for i in range(63):
                sums[i] += 1 if (h >> i) & 1 else -1
        fp = sum(1 << i for i in range(63) if sums[i] > 0)
        out.append((int(r.doc_id), fp))
    return out


def simhash_near_rows(
    sf_dir: str, radius: int = 3, bands: int | None = None
) -> list[tuple]:
    """(id_a, id_b, hamming) — pigeonhole-banded simhash near-dup pairs
    (engine: operators/dedup.py::simhash_near_pairs)."""
    nb = bands if bands is not None else radius + 1
    width = 63 // nb
    fps = dict(simhash_rows(sf_dir))
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, fp in fps.items():
        for b in range(nb):
            lo = b * width
            hi = 63 if b == nb - 1 else (b + 1) * width
            mask = ((1 << (hi - lo)) - 1) << lo
            buckets.setdefault((b, fp & mask), []).append(did)
    out: dict[tuple[int, int], int] = {}
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b2 = ids[i], ids[j]
                if (a, b2) in out:
                    continue
                ham = bin(fps[a] ^ fps[b2]).count("1")
                if ham <= radius:
                    out[(a, b2)] = ham
    return [(a, b2, h) for (a, b2), h in sorted(out.items())]


# --------------------------------------------------------- hyperplane LSH

def _signs(dim: int, num_planes: int, seed: int) -> list[list[int]]:
    return [
        [1 if spark_xxhash64(("int", seed), ("int", p), ("int", d)) % 2 == 0 else -1
         for d in range(dim)]
        for p in range(num_planes)
    ]


def _signature(vec, signs) -> int:
    sig = 0
    for p, srow in enumerate(signs):
        comp = 0.0
        for x, s in zip(vec, srow):  # sequential left fold == F.aggregate
            comp = comp + (x if s > 0 else -x)
        if comp > 0.0:
            sig += 1 << p
    return sig


def _cosine(a, b) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ann_lsh_topk_rows(
    sf_dir: str,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 6,
    n_queries: int = 5,
) -> list[tuple]:
    """(qid, vec_id, cosine, rank) — MULTI-TABLE hyperplane LSH: per
    table t (seed 42+1000t) candidates share the exact signature or a
    Hamming-1 probe; candidate sets union across tables, then exact
    cosine rerank (engine: operators/similarity.py::cosine_topk_lsh)."""
    emb = _load_pandas(sf_dir, "embeddings")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    sigs = []  # per table: {vid: sig}
    for t in range(num_tables):
        signs = _signs(dim, num_planes, 42 + 1000 * t)
        sigs.append({vid: _signature(v, signs) for vid, v in vecs.items()})
    out = []
    for qid in sorted(vid for vid in vecs if vid < n_queries):
        cand_ids: set[int] = set()
        for t in range(num_tables):
            qsig = sigs[t][qid]
            probes = {qsig} | {qsig ^ (1 << p) for p in range(num_planes)}
            cand_ids.update(vid for vid, s in sigs[t].items() if s in probes)
        cands = [
            (vid, _round_half_up(_cosine(vecs[vid], vecs[qid]), 4))
            for vid in cand_ids
        ]
        cands.sort(key=lambda t2: (-t2[1], t2[0]))
        for rank, (vid, cos) in enumerate(cands[:k], start=1):
            out.append((qid, vid, cos, rank))
    return out


def emb_near_dup_lsh_rows(
    sf_dir: str,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> list[tuple]:
    """(id_a, id_b, cosine) — LSH-bucketed embedding near-dup pairs
    (engine: operators/similarity.py::embedding_near_dup_pairs): pairs
    sharing the single-table hyperplane signature bucket, exact cosine
    ≥ threshold. The SCALE path's oracle — the brute crossJoin variant
    (emb_near_dup) keeps its DuckDB oracle; this pins the bucketed plan's
    candidate generation too."""
    emb = _load_pandas(sf_dir, "embeddings")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    signs = _signs(dim, num_planes, seed)
    buckets: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        buckets.setdefault(_signature(v, signs), []).append(vid)
    out = []
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cos = _round_half_up(_cosine(vecs[ids[i]], vecs[ids[j]]), 4)
                if cos >= threshold:
                    out.append((ids[i], ids[j], cos))
    return sorted(out)


def minhash_keep_rows(
    sf_dir: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> list[tuple]:
    """(doc_id,) survivors of minhash near-dup collapse: any doc that is
    the id_b of a candidate pair maps to a smaller representative and is
    dropped (engine: operators/dedup.py::minhash_lsh_dedup)."""
    docs = _load_pandas(sf_dir, "documents")
    pairs = minhash_pairs_rows(sf_dir, k_shingle, num_hashes, bands, threshold)
    dropped = {b for _a, b, _e in pairs}
    return [(int(d),) for d in docs["doc_id"] if int(d) not in dropped]


@functools.lru_cache(maxsize=4)
def _minhash_index(sf_dir: str, k_shingle: int, num_hashes: int, bands: int):
    """sigs dict + LSH buckets over ALL documents (shared by ALL minhash
    oracles — memoized because the signature pass is the expensive part:
    ~len(text)·num_hashes pure-python xxh64 calls per doc, ~20 min at the
    sf1 fixture's 50k docs, and four oracles need the identical index.
    Callers treat the returned dicts as read-only."""
    docs = _load_pandas(sf_dir, "documents")
    rows_per_band = num_hashes // bands
    sigs: dict[int, list[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for r in docs.itertuples():
        bases = [spark_xxhash64(("str", s)) for s in _shingles(r.text, k_shingle)]
        sig = [
            min(spark_xxhash64(("long", h), ("int", j)) for h in bases)
            for j in range(num_hashes)
        ]
        did = int(r.doc_id)
        sigs[did] = sig
        for b in range(bands):
            band_key = ",".join(
                str(sig[b * rows_per_band + rr]) for rr in range(rows_per_band)
            )
            buckets.setdefault((b, spark_xxhash64(("str", band_key))), []).append(did)
    return sigs, buckets


def minhash_incremental_pairs_rows(
    sf_dir: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    mod: int = 5,
    rem: int = 4,
) -> list[tuple]:
    """(new_id, corpus_id, jaccard_est) — new batch = doc_id % mod == rem
    collided against the rest of the corpus (engine:
    operators/dedup.py::minhash_incremental_pairs)."""
    sigs, buckets = _minhash_index(sf_dir, k_shingle, num_hashes, bands)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        uniq = sorted(set(ids))
        new = [d for d in uniq if d % mod == rem]
        corp = [d for d in uniq if d % mod != rem]
        for n in new:
            for c in corp:
                pairs.add((n, c))
    out = []
    for n, c in sorted(pairs):
        est = sum(x == y for x, y in zip(sigs[n], sigs[c])) / num_hashes
        if est >= threshold:
            out.append((n, c, est))
    return out


def minhash_incremental_keep_rows(
    sf_dir: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    mod: int = 5,
    rem: int = 4,
) -> list[tuple]:
    """(doc_id,) new-batch survivors: dropped if corpus-matched at
    ``threshold``, or the larger id of a within-batch candidate pair
    (engine: operators/dedup.py::minhash_incremental_dedup)."""
    sigs, buckets = _minhash_index(sf_dir, k_shingle, num_hashes, bands)
    new_ids = sorted(d for d in sigs if d % mod == rem)
    dropped: set[int] = set()
    for n, _c, _e in minhash_incremental_pairs_rows(
        sf_dir, k_shingle, num_hashes, bands, threshold, mod, rem
    ):
        dropped.add(n)
    within: set[tuple[int, int]] = set()
    for ids in buckets.values():
        uniq = sorted(set(d for d in ids if d % mod == rem))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                within.add((uniq[i], uniq[j]))
    for a, b in within:
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / num_hashes
        if est >= threshold:
            dropped.add(b)
    return [(d,) for d in new_ids if d not in dropped]


def weighted_sample_rows(sf_dir: str, k: int = 25, salt: int = 42) -> list[tuple]:
    """(doc_id, n_tokens) — Efraimidis-Spirakis race replayed in pure
    python (engine: operators/sampling.py::weighted_sample): u = top-63
    hash bits scaled to (0,1], score = -ln(u)/n_tokens, k smallest."""
    import math

    docs = _load_pandas(sf_dir, "documents")
    scored = []
    for r in docs.itertuples():
        w = len(_words(r.text))
        if w <= 0:
            continue
        h = spark_xxhash64(("long", int(r.doc_id)), ("int", salt))
        u = (((h & 0xFFFFFFFFFFFFFFFF) >> 1) + 1) / float(2 ** 63)
        scored.append((-math.log(u) / w, int(r.doc_id), w))
    scored.sort()
    return [(d, w) for _s, d, w in scored[:k]]


def ann_recall_rows(
    sf_dir: str,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 6,
    n_queries: int = 5,
) -> list[tuple]:
    """[(n_queries, recall)] — measured recall@k of the LSH path vs exact
    brute-force top-k (engine: operators/similarity.py::lsh_recall).
    Both sides recomputed here: the exact ranking uses the same rounded
    cosine + (desc cosine, asc id) tie-break as the engine."""
    emb = _load_pandas(sf_dir, "embeddings")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    exact: set[tuple[int, int]] = set()
    for qid in sorted(vid for vid in vecs if vid < n_queries):
        scored = [
            (vid, _round_half_up(_cosine(v, vecs[qid]), 4)) for vid, v in vecs.items()
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        exact.update((qid, vid) for vid, _ in scored[:k])
    approx = {
        (qid, vid)
        for qid, vid, _cos, _rank in ann_lsh_topk_rows(
            sf_dir, k=k, num_planes=num_planes, num_tables=num_tables, n_queries=n_queries
        )
    }
    recall = len(approx & exact) / len(exact) if exact else 1.0
    return [(n_queries, recall)]


def ivf_topk_rows(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_queries: int = 5,
) -> list[tuple]:
    """(qid, vec_id, cosine, rank) — IVF ANN with deterministic seed
    centroids (lowest-id vectors), nearest-centroid assignment, n_probe
    search, exact rerank (engine: similarity.py::cosine_topk_ivf)."""
    emb = _load_pandas(sf_dir, "embeddings")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    cents = [(cid, vecs[cid]) for cid in sorted(vecs)[:n_centroids]]

    def nearest(v, n):
        scored = sorted(((-_cosine(v, cv), cid) for cid, cv in cents))
        return [cid for _neg, cid in scored[:n]]

    assign = {vid: nearest(v, 1)[0] for vid, v in vecs.items()}
    out = []
    for qid in sorted(vid for vid in vecs if vid < n_queries):
        probes = set(nearest(vecs[qid], n_probe))
        cands = [
            (vid, _round_half_up(_cosine(vecs[vid], vecs[qid]), 4))
            for vid, cid in assign.items()
            if cid in probes
        ]
        cands.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, cos) in enumerate(cands[:k], start=1):
            out.append((qid, vid, cos, rank))
    return out


# -------------------------------------------------- URL canonicalization

def _url_fixture(n: int = 200) -> list[tuple[int, str]]:
    """Deterministic messy-URL fixture (mirrored by the engine query's
    generator — same formula, zero shared code)."""
    out = []
    for i in range(n):
        j = i // 2  # pair (2j, 2j+1): same logical URL, different mess
        scheme = "HTTPS" if j % 5 == 0 else "http"
        host = f"site{j % 7}.example.com"
        if i % 3 == 0:
            host = host.upper()
        path = f"/a/b{j % 11}" + "/" * (i % 3)
        params = []
        if j % 9 != 0:
            params = [f"x={j % 13}", f"y={j % 4}"]
            if j % 4 == 0:
                params.append(f"utm_source=t{j % 5}")
            if i % 2 == 0:
                params.reverse()
        url = f"{scheme}://{host}{path}"
        if params:
            url += "?" + "&".join(params)
        if i % 6 == 0:
            url += "#frag"
        out.append((i, url))
    return out


def _canon_url(u: str) -> str:
    """Independent pure-python canonicalization (engine:
    functions/urls.py::canonicalize_url without strip_params)."""
    rest = u.strip()
    scheme, _, rest = rest.partition("://")
    frag_cut = rest.split("#", 1)[0]
    hostpart, sep_q, query = frag_cut.partition("?")
    host, slash, path = hostpart.partition("/")
    path = (slash + path).rstrip("/")
    params = sorted(p for p in query.split("&") if p != "")
    q_part = "?" + "&".join(params) if params else ""
    return f"{scheme.lower()}://{host.lower()}{path}{q_part}"


def url_canon_rows(n: int = 200) -> list[tuple]:
    """(canon, n_urls, min_id) — canonical groups of the fixture."""
    groups: dict[str, list[int]] = {}
    for i, u in _url_fixture(n):
        groups.setdefault(_canon_url(u), []).append(i)
    return [(c, len(ids), min(ids)) for c, ids in sorted(groups.items())]


# ----------------------------------------------------------------- PQ ANN

def _np_round(x: float, d: int) -> float:
    """numpy.round semantics in pure python: scale by 10^d (float),
    rint half-even on the SCALED float, unscale — differs from python's
    round(), which rounds the decimal value correctly; the engine uses
    np.round so the oracle replicates it bit-for-bit."""
    s = x * float(10 ** d)
    f = math.floor(s)
    frac = s - f
    if frac > 0.5 or (frac == 0.5 and f % 2 == 1):
        f += 1
    return f / float(10 ** d)


def _pq_setup(sf_dir: str, m: int, n_codes: int):
    emb = _load_pandas(sf_dir, "embeddings")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    sub = dim // m
    seeds = [vecs[vid] for vid in sorted(vecs)[:n_codes]]
    books = [[s[j * sub:(j + 1) * sub] for s in seeds] for j in range(m)]

    def subdist(a, b):
        t = 0.0
        for x, y in zip(a, b):
            t += (x - y) * (x - y)
        return t

    def code_of(v):
        out = []
        for j in range(m):
            vj = v[j * sub:(j + 1) * sub]
            best, best_d = 0, None
            for c, cb in enumerate(books[j]):
                d = subdist(vj, cb)
                if best_d is None or d < best_d:
                    best, best_d = c, d
            out.append(best)
        return out

    return vecs, sub, books, subdist, code_of


def pq_topk_rows(sf_dir: str, k: int = 10, m: int = 8, n_codes: int = 16,
                 n_queries: int = 5) -> list[tuple]:
    """(qid, vec_id, adc_dist, rank) — seed-codebook PQ with asymmetric
    distance (engine: operators/pq.py::pq_topk). Arithmetic mirrors the
    engine's numpy order: serial subspace sums, sequential-j ADC
    accumulation, np.round half-even-on-scaled at 4dp."""
    vecs, sub, books, subdist, code_of = _pq_setup(sf_dir, m, n_codes)
    codes = {vid: code_of(v) for vid, v in vecs.items()}
    out = []
    for qid in sorted(vid for vid in vecs if vid < n_queries):
        q = vecs[qid]
        lut = [[subdist(q[j * sub:(j + 1) * sub], cb) for cb in books[j]]
               for j in range(len(books))]
        scored = []
        for vid, cs in codes.items():
            d = 0.0
            for j, c in enumerate(cs):
                d += lut[j][c]
            scored.append((_np_round(d, 4), vid))
        scored.sort()
        for rank, (d, vid) in enumerate(scored[:k], start=1):
            out.append((qid, vid, d, rank))
    return out


def pq_recall_rows(sf_dir: str, k: int = 10, m: int = 8, n_codes: int = 16,
                   n_queries: int = 5) -> list[tuple]:
    """(n_queries, recall) — ADC recall@k vs exact L2
    (engine: operators/pq.py::pq_recall)."""
    vecs, sub, books, subdist, code_of = _pq_setup(sf_dir, m, n_codes)
    topk_rows = pq_topk_rows(sf_dir, k=k, m=m, n_codes=n_codes, n_queries=n_queries)
    approx: dict[int, set] = {}
    for qid, vid, _d, _r in topk_rows:
        approx.setdefault(qid, set()).add(vid)
    hits = tot = 0
    for qid in sorted(vid for vid in vecs if vid < n_queries):
        q = vecs[qid]
        exact = sorted((subdist(v, q), vid) for vid, v in vecs.items())[:k]
        exact_ids = {vid for _d, vid in exact}
        hits += len(exact_ids & approx.get(qid, set()))
        tot += len(exact_ids)
    return [(n_queries, hits / tot if tot else 0.0)]


# --------------------------------------------------------- media features

def media_features_rows(n: int = 200) -> list[tuple]:
    """(media_id, kind, n_bytes, checksum, fake_mean) — recomputes the
    synthetic_media fixture + deterministic stub features
    (engine: operators/multimodal.py)."""
    kinds = ["image", "audio", "video"]
    out = []
    for i in range(n):
        kind = kinds[spark_xxhash64(("long", i)) % 3]
        pad = spark_xxhash64(("long", i), ("int", 1)) % 64 + 16
        payload = f"BLOB{i}" + "x" * pad
        raw = payload.encode("utf-8")
        nb = len(raw)
        checksum = sum(raw[:256]) % 65536
        fake_mean = (sum(raw[:64]) / max(1, min(nb, 64))) if nb else 0.0
        out.append((i, kind, nb, checksum, float(fake_mean)))
    return out


def media_frames_rows(n: int = 120, every_ms: int = 1000) -> list[tuple]:
    """(media_id, frame_idx, frame_hex) — recomputes synthetic_media's
    video rows + the stub frame sampler's deterministic byte slices
    (engine: operators/multimodal.py::sample_frames), frames hex-encoded
    (uppercase, matching Spark F.hex) for SQL comparability."""
    kinds = ["image", "audio", "video"]
    out = []
    for i in range(n):
        if kinds[spark_xxhash64(("long", i)) % 3] != "video":
            continue
        pad = spark_xxhash64(("long", i), ("int", 1)) % 64 + 16
        payload = (f"BLOB{i}" + "x" * pad).encode("utf-8")
        dur = spark_xxhash64(("long", i), ("int", 2)) % 5000 + 500
        for fi in range(max(1, dur // every_ms)):
            lo = (fi * 32) % max(1, len(payload))
            out.append((i, fi, payload[lo : lo + 32].hex().upper()))
    return out


# ------------------------------------------------------- hash split/sample

def hash_split_rows(sf_dir: str, table: str, col: str,
                    fractions: list[tuple[str, float]], salt: int = 42,
                    resolution: int = 1_000_000) -> list[tuple]:
    """(split, n_rows, sum_chars) — independent recompute of
    operators/sampling.py::hash_split over ``documents``: bucket =
    pmod(xxhash64(col, int(salt)), resolution), cumulative-fraction
    boundaries, last split absorbs the remainder."""
    pdf = _load_pandas(sf_dir, table)
    bounds = []
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        bounds.append((name, int(round(cum * resolution))))
    agg: dict[str, list[int]] = {}
    for text, n_chars in zip(pdf[col], pdf["n_chars"]):
        b = spark_xxhash64(("str", text), ("int", salt)) % resolution
        name = fractions[-1][0]
        for nm, bound in bounds:
            if b < bound:
                name = nm
                break
        a = agg.setdefault(name, [0, 0])
        a[0] += 1
        a[1] += int(n_chars)
    return [(name, a[0], a[1]) for name, a in sorted(agg.items())]


def stratified_sample_rows(sf_dir: str, table: str, col: str, stratum_col: str,
                           fractions: dict[str, float], default_fraction: float = 0.0,
                           salt: int = 42, resolution: int = 1_000_000) -> list[tuple]:
    """(stratum, n_rows, sum_ids) — recompute of
    operators/sampling.py::sample_stratified over ``documents``."""
    pdf = _load_pandas(sf_dir, table)
    agg: dict[str, list[int]] = {}
    for text, stratum, doc_id in zip(pdf[col], pdf[stratum_col], pdf["doc_id"]):
        bound = int(round(fractions.get(stratum, default_fraction) * resolution))
        if spark_xxhash64(("str", text), ("int", salt)) % resolution < bound:
            a = agg.setdefault(stratum, [0, 0])
            a[0] += 1
            a[1] += int(doc_id)
    return [(s, a[0], a[1]) for s, a in sorted(agg.items())]


# ------------------------------------------------------------- KMV sketch

def kmv_rows(sf_dir: str, table: str, col: str, k: int,
             kind: str = "str") -> list[tuple]:
    """(k, n_kept, kth_hash, est_distinct) — independent recompute of
    operators/sketches.py::kmv_distinct: xxhash64 every value, keep the
    k smallest distinct hashes, N̂ = (k-1)/u_k with
    u_k = (float(h_k) + float(2^63+1)) / float(2^64) — the float() casts
    replicate the JVM long→double rounding exactly."""
    pdf = _load_pandas(sf_dir, table)
    hashes = sorted({spark_xxhash64((kind, v)) for v in pdf[col] if v is not None})
    kept = hashes[:k]
    n_kept = len(kept)
    if n_kept < k:
        est = float(n_kept)
    else:
        u_k = (float(kept[-1]) + float(2**63 + 1)) / float(2**64)
        est = float(k - 1) / u_k
    return [(k, n_kept, kept[-1] if kept else None, _round_half_up(est, 2))]


# ----------------------------------------------- real-codec media features
#
# Independent recompute of the round-3 REAL decode kernels
# (operators/multimodal.py::decode_features / decode_video_frames over
# operators/codecs.py). The engine encodes the documented content
# formula into real BMP/WAV/DXV containers and decodes them back; this
# oracle computes the expected statistics DIRECTLY from the formula in
# pure python — any corruption introduced by the encoder or decoder
# shows up as a stat mismatch. Arithmetic mirrors the engine's order
# (per-frame mean then mean-of-means; sums are integer-exact in float64
# so numpy pairwise == python serial).


def _img_dims(m: int) -> tuple[int, int]:
    return 16 + (m * 7) % 17, 12 + (m * 5) % 13  # (w, h)


def _vid_dims(m: int) -> tuple[int, int, int]:
    return 8 + (m % 9), 6 + (m % 7), 2 + (m * 3) % 7  # (w, h, nf)


def _thumb_axes(h: int, w: int) -> tuple[list[int], list[int]]:
    return [(i * h) // 4 for i in range(4)], [(j * w) // 4 for j in range(4)]


def media_decoded_rows(n: int = 120) -> list[tuple]:
    """(media_id, kind, width, height, n_frames, n_samples, sample_rate,
    duration_ms, mean_luma, rms, peak, zcr, thumb_checksum)."""
    out = []
    for m in range(n):
        k = ("image", "audio", "video")[m % 3]
        row = {c: None for c in ("width", "height", "n_frames", "n_samples",
                                 "sample_rate", "duration_ms", "mean_luma",
                                 "rms", "peak", "zcr", "thumb_checksum")}
        if k == "image":
            w, h = _img_dims(m)
            means = []
            for c in range(3):
                s = sum((m * 7 + y * 31 + x * 13 + c * 5) % 256
                        for y in range(h) for x in range(w))
                means.append(s / (h * w))
            ys, xs = _thumb_axes(h, w)
            thumb = sum((m * 7 + y * 31 + x * 13 + c * 5) % 256
                        for y in ys for x in xs for c in range(3))
            row.update(width=w, height=h,
                       mean_luma=round(0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2], 6),
                       thumb_checksum=thumb)
        elif k == "audio":
            ns = 800 + (m * 37) % 1200
            s = [((m * 2654435761 + i * 40503) % 65536) - 32768 for i in range(ns)]
            zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
            row.update(n_samples=ns, sample_rate=8000,
                       duration_ms=ns * 1000 // 8000,
                       rms=round(math.sqrt(sum(float(v) * float(v) for v in s) / ns), 6),
                       peak=max(abs(v) for v in s),
                       zcr=round(zc / (ns - 1), 6))
        else:
            w, h, nf = _vid_dims(m)
            fmeans = [sum((m * 11 + f * 17 + y * 3 + x * 5) % 256
                          for y in range(h) for x in range(w)) / (h * w)
                      for f in range(nf)]
            row.update(width=w, height=h, n_frames=nf,
                       mean_luma=round(sum(fmeans) / nf, 6))
        out.append((m, k, row["width"], row["height"], row["n_frames"],
                    row["n_samples"], row["sample_rate"], row["duration_ms"],
                    row["mean_luma"], row["rms"], row["peak"], row["zcr"],
                    row["thumb_checksum"]))
    return out


def media_video_frame_rows(n: int = 120) -> list[tuple]:
    """(media_id, frame_idx, frame_luma, thumb_checksum) for every frame
    of every DXV fixture row."""
    out = []
    for m in range(n):
        if m % 3 != 2:
            continue
        w, h, nf = _vid_dims(m)
        ys, xs = _thumb_axes(h, w)
        for f in range(nf):
            s = sum((m * 11 + f * 17 + y * 3 + x * 5) % 256
                    for y in range(h) for x in range(w))
            thumb = sum((m * 11 + f * 17 + y * 3 + x * 5) % 256
                        for y in ys for x in xs)
            out.append((m, f, round(s / (h * w), 6), thumb))
    return out


# ------------------------------------------------------------- SQL emitter

def values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """Render rows as ``SELECT CAST(...) ... FROM (VALUES ...)`` DuckDB SQL.

    ``cols`` is [(name, duckdb_type)]; floats are emitted as QUOTED
    ``repr`` strings (VARCHAR → DOUBLE cast parses the shortest
    round-trip decimal back to the identical double; a bare numeric
    literal would go through DECIMAL first and can lose the last ulp on
    17-significant-digit values — observed on media_features)."""
    if not rows:
        casts = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return f"SELECT {casts} WHERE 1=0"

    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return "'" + repr(v) + "'"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    body = ",\n".join("(" + ", ".join(fmt(v) for v in row) + ")" for row in rows)
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(cols))
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({names})"


# ------------------------------------------------------------------- HLL

def hll_register_rows(sf_dir: str, p: int = 6) -> list[tuple]:
    """(bucket, max_rho) register table over the synthetic per-doc URLs
    (engine: operators/sketches.py::hll_registers) — bit-identical
    reproduction via the pure-python xxh64."""
    docs = _load_pandas(sf_dir, "documents")
    mask = (1 << 64) - 1
    regs: dict[int, int] = {}
    width = 64 - p
    for r in docs.itertuples():
        url = f"https://{r.source}.example.com/page/{int(r.doc_id) % 97}"
        u = spark_xxhash64(url) & mask  # unsigned view of the signed hash
        bucket = u & ((1 << p) - 1)
        rho = width + 1 - (u >> p).bit_length()
        if regs.get(bucket, 0) < rho:
            regs[bucket] = rho
    return sorted(regs.items())


# ------------------------------------------- canonical-key CDC merge

def url_change_fixture(n: int = 200) -> list[tuple]:
    """(lsn, url, op, ts_str, value): a messy-URL change stream over the
    shared _url_fixture — several raw spellings of one logical page
    racing through inserts/updates/deletes (mirrored by the engine
    query's generator; zero shared code with the Spark plan)."""
    rows = []
    for i, u in _url_fixture(n):
        op = "D" if i % 17 == 0 else ("I" if i % 7 == 0 else "U")
        ts_min = (i * 37) % 100
        ts = f"2024-01-01 {ts_min // 60:02d}:{ts_min % 60:02d}:00"
        rows.append((i, u, op, ts, float(i) * 0.5))
    return rows


def canonical_merge_rows(n: int = 200) -> list[tuple]:
    """Final LWW table state of url_change_fixture keyed by the
    CANONICAL url: winner per canon group by (ts, lsn); a winning
    tombstone removes the key. Output (canon, last_lsn, last_url,
    last_ts, last_value)."""
    best: dict[str, tuple] = {}
    for lsn, url, op, ts, val in url_change_fixture(n):
        c = _canon_url(url)
        cur = best.get(c)
        if cur is None or (ts, lsn) > (cur[0], cur[1]):
            best[c] = (ts, lsn, url, op, val)
    out = []
    for c, (ts, lsn, url, op, val) in sorted(best.items()):
        if op == "D":
            continue
        out.append((c, lsn, url, ts, val))
    return out


# ----------------------------------------------- connected components

def components_rows(sf_dir: str, k_shingle: int = 3, num_hashes: int = 32,
                    bands: int = 8, threshold: float = 0.5) -> list[tuple]:
    """(id, component) over the minhash near-dup pair graph — an
    independent union-find (path-compressed) replay of the SAME pair set
    minhash_pairs_rows computes (engine: operators/components.py::
    connected_components via alternating large/small-star). Only nodes
    appearing in at least one pair are emitted, matching the engine."""
    pairs = minhash_pairs_rows(sf_dir, k_shingle=k_shingle,
                               num_hashes=num_hashes, bands=bands,
                               threshold=threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b, _est in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = {int(a) for a, b, _ in pairs} | {int(b) for a, b, _ in pairs}
    return sorted((n, find(n)) for n in nodes)


def component_survivors_rows(sf_dir: str, **kw) -> list[tuple]:
    """(doc_id,) — docs that survive component-level near-dup collapse:
    every doc except non-root members of a component (engine:
    operators/components.py::component_dedup)."""
    comp = dict(components_rows(sf_dir, **kw))
    docs = _load_pandas(sf_dir, "documents")
    out = []
    for did in docs["doc_id"]:
        did = int(did)
        if comp.get(did, did) == did:
            out.append((did,))
    return sorted(out)


# ------------------------------------------------------- count-min sketch

def cms_word_rows(sf_dir: str, depth: int = 4, width: int = 64) -> list[tuple]:
    """(d, bucket, cnt) — count-min counters over every word of every
    document (engine: operators/sketches.py::cms_counts after a word
    explode). bucket_d(word) = pmod(xxhash64(word, int d), width)."""
    docs = _load_pandas(sf_dir, "documents")
    counts: dict[tuple[int, int], int] = {}
    for r in docs.itertuples():
        for w in _words(r.text):
            for d in range(depth):
                b = spark_xxhash64(("str", w), ("int", d)) % width
                counts[(d, b)] = counts.get((d, b), 0) + 1
    return sorted((d, b, c) for (d, b), c in counts.items())


# -------------------------------------------------- repeated-span dedup

def repeated_span_rows(sf_dir: str, k: int = 8, min_count: int = 2) -> list[tuple]:
    """(doc_id, n_words, n_dup_spans, n_covered_words, dup_ratio) —
    ExactSubstr-style repeated k-word-span statistics (engine:
    operators/dedup.py::repeated_span_stats — defaults kept IDENTICAL):
    span hash = xxhash64 of the space-joined k words; flagged if its
    corpus-wide occurrence count (within-doc repeats included) >=
    min_count; coverage = union of flagged [i, i+k) position ranges.
    Empty/null text counts 0 words (the engine's token_count guard)."""
    docs = _load_pandas(sf_dir, "documents")
    counts: dict[int, int] = {}
    per_doc: dict[int, tuple[int, list[int]]] = {}
    for r in docs.itertuples():
        nrm = _normalize(r.text or "")
        w = nrm.split(" ") if nrm else []
        hs = []
        if len(w) >= k:
            for i in range(len(w) - k + 1):
                h = spark_xxhash64(("str", " ".join(w[i:i + k])))
                hs.append(h)
                counts[h] = counts.get(h, 0) + 1
        per_doc[int(r.doc_id)] = (len(w), hs)
    out = []
    for did, (nw, hs) in sorted(per_doc.items()):
        flagged = [i for i, h in enumerate(hs) if counts[h] >= min_count]
        covered: set[int] = set()
        for i in flagged:
            covered.update(range(i, i + k))
        ratio = _round_half_up(len(covered) / max(nw, 1), 6)
        out.append((did, nw, len(flagged), len(covered), ratio))
    return out


def kmeans_rows(sf_dir: str, k: int = 8, iters: int = 3,
                init_sample: int = 256, augment: int = 0) -> list[tuple]:
    """(vec_id, cluster) — full distributed-k-means replay (engine:
    operators/clustering.py): farthest-point init over the lowest-id
    sample, then ``iters`` Lloyd rounds with DECIMAL(30,15) component
    sums (the engine's partition-order-free exact update), argmin ties
    to the lowest centroid index."""
    import numpy as np

    from datax_spark.operators.clustering import (
        decimal_component, farthest_point_init)

    emb = _load_pandas(sf_dir, "embeddings").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    M = np.array([[float(x) for x in v] for v in emb["embedding"]], dtype="float64")
    if augment:
        # mirror __spark_entry__._augmented_embeddings: ids < augment
        # duplicated to id+10000, components ×1.02 in double
        sel = ids < augment
        ids = np.concatenate([ids, ids[sel] + 10000])
        M = np.vstack([M, M[sel] * 1.02])
        order = np.argsort(ids, kind="stable")
        ids, M = ids[order], M[order]

    C = farthest_point_init(M[:init_sample], k)
    for _ in range(iters):
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = C.copy()
        for c in range(k):
            members = M[a == c]
            if len(members) == 0:
                continue
            for d in range(C.shape[1]):
                s = sum((decimal_component(v) for v in members[:, d]),
                        start=__import__("decimal").Decimal(0))
                new[c, d] = float(s) / len(members)
        C = new
    d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return [(int(i), int(c)) for i, c in zip(ids, a)]


# ------------------------------------------------------------------ DSIR

def _dsir_feats(text: str) -> list[str]:
    """Unigrams + bigrams of the engine's normalized whitespace tokens
    (operators/dsir.py::hashed_ngram_features)."""
    w = [x for x in _words(text) if x]
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _dsir_lr(sf_dir: str, num_buckets: int, alpha: float, salt: int):
    """(docs_df, per-bucket Decimal log-ratio dict) — target = non-'en'
    documents, raw = all documents; Laplace-smoothed hashed-ngram LMs.
    Python ``%`` is floored like Spark ``pmod``, and ``math.log`` is the
    SAME call the engine's driver-side log_ratio_table makes, so the
    table is bit-identical by construction."""
    import math
    from decimal import ROUND_HALF_UP

    docs = _load_pandas(sf_dir, "documents")

    def counts(texts):
        c: dict[int, int] = {}
        for text in texts:
            for f in _dsir_feats(text):
                b = spark_xxhash64(("str", f), ("int", salt)) % num_buckets
                c[b] = c.get(b, 0) + 1
        return c

    raw_c = counts(r.text for r in docs.itertuples())
    tgt_c = counts(r.text for r in docs.itertuples() if r.lang != "en")
    t_tot = sum(tgt_c.values()) + alpha * num_buckets
    r_tot = sum(raw_c.values()) + alpha * num_buckets
    q = Decimal("1e-12")
    lr = {
        b: Decimal(repr(
            math.log((tgt_c.get(b, 0) + alpha) / t_tot)
            - math.log((raw_c.get(b, 0) + alpha) / r_tot)
        )).quantize(q, rounding=ROUND_HALF_UP)
        for b in range(num_buckets)
    }
    return docs, lr


def dsir_weight_rows(sf_dir: str, num_buckets: int = 10_000,
                     alpha: float = 1.0, salt: int = 7) -> list[tuple]:
    """(doc_id, n_feats, logratio) — engine:
    operators/dsir.py::dsir_importance_weights (target = non-'en' docs).
    Per-doc sums run in Decimal exactly like the engine's DECIMAL
    aggregate; the final cast+round mirrors F.round(cast double, 6)."""
    docs, lr = _dsir_lr(sf_dir, num_buckets, alpha, salt)
    out = []
    for r in docs.itertuples():
        feats = _dsir_feats(r.text)
        if not feats:
            continue
        s = Decimal(0)
        for f in feats:
            s += lr[spark_xxhash64(("str", f), ("int", salt)) % num_buckets]
        out.append((int(r.doc_id), len(feats), _round_half_up(float(s), 6)))
    return out


def dsir_select_rows(sf_dir: str, k: int = 50, num_buckets: int = 10_000,
                     alpha: float = 1.0, salt: int = 7,
                     gumbel_salt: int = 99) -> list[tuple]:
    """(doc_id, n_feats, logratio) of the Gumbel-top-k resample —
    engine: operators/dsir.py::dsir_select. The Gumbel noise is hash-
    derandomized from the doc id, so the race replays exactly."""
    import math

    scored = []
    for doc_id, n_feats, logratio in dsir_weight_rows(
            sf_dir, num_buckets, alpha, salt):
        h = spark_xxhash64(("long", doc_id), ("int", gumbel_salt))
        u = (((h & 0xFFFFFFFFFFFFFFFF) >> 1) + 1) / float(2 ** 63)
        g = -math.log(-math.log(u))
        scored.append((logratio + g, doc_id, n_feats, logratio))
    scored.sort(reverse=True)
    return [(d, n, w) for _k, d, n, w in scored[:k]]
