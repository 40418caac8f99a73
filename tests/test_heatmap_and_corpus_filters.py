"""Tile raster heatmap (geo→image sink) + Gopher-repetition and
decontamination corpus filters: brute-force/numpy differentials and a
PNG decode round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TINY


# ------------------------------------------------------------------ heatmap
def test_tile_heatmap_matches_numpy_replay(spark):
    from fagi_gis_spark.index.tiles import pixel_xy_np, tile_xy_np
    from fagi_gis_spark.operators.heatmap import tile_heatmap
    from fagi_gis_spark.registry import layers

    z, px = 9, 64
    pts = layers(spark, SF_TINY)["poi_a"].select("lon", "lat")
    got = tile_heatmap(pts, z=z, px=px).toPandas()

    pdf = pts.toPandas()
    tx, ty = tile_xy_np(pdf.lon.to_numpy(), pdf.lat.to_numpy(), z)
    qx, qy = pixel_xy_np(pdf.lon.to_numpy(), pdf.lat.to_numpy(), z, px)
    exp = (
        pd.DataFrame({"x": tx, "y": ty, "px_x": qx, "px_y": qy})
        .groupby(["x", "y", "px_x", "px_y"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    key = ["x", "y", "px_x", "px_y"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got[key + ["cnt"]].to_numpy() == exp[key + ["cnt"]].to_numpy()).all()
    assert (got.px_x.between(0, px - 1)).all() and (got.px_y.between(0, px - 1)).all()


def test_render_heatmap_png_roundtrip(spark):
    from fagi_gis_spark.operators.heatmap import render_heatmap_png, tile_heatmap
    from fagi_gis_spark.registry import layers
    from fagi_gis_spark.sources.png import decode_png_gray

    z, px = 9, 32
    pts = layers(spark, SF_TINY)["poi_a"].select("lon", "lat")
    heat = tile_heatmap(pts, z=z, px=px)
    hp = heat.toPandas()
    tiles_out = render_heatmap_png(heat, px=px).toPandas()
    assert len(tiles_out) == hp.groupby(["x", "y"]).ngroups
    for _, row in tiles_out.iterrows():
        img = decode_png_gray(bytes(row.png))
        assert img.shape == (px, px)
        sub = hp[(hp.x == row.x) & (hp.y == row.y)]
        grid = np.zeros((px, px), dtype=np.float64)
        grid[sub.px_y.to_numpy(), sub.px_x.to_numpy()] = sub.cnt.to_numpy()
        m = grid.max()
        exp = np.floor(grid * (255.0 / m) + 0.5).astype(np.uint8)
        assert (img == exp).all()
        assert int(row.max_cnt) == int(m)
        assert int(row.n_points) == int(sub.cnt.sum())
        # the hottest pixel renders full-white; empties render black
        assert img.max() == 255 and (img[grid == 0] == 0).all()


def test_heatmap_pyramid_box_sums(spark):
    from fagi_gis_spark.operators.heatmap import heatmap_pyramid, tile_heatmap
    from fagi_gis_spark.registry import layers

    z, px = 9, 64
    pts = layers(spark, SF_TINY)["poi_a"].select("lon", "lat")
    heat = tile_heatmap(pts, z=z, px=px)
    pyr = heatmap_pyramid(heat, z_base=z, z_min=7, px=px).toPandas()
    n_pts = pts.count()
    # mass conservation: every level re-sums to the full point count
    assert (pyr.groupby("z").cnt.sum() == n_pts).all()
    # each coarser pixel is the exact 2x2 box-sum of its children
    base = pyr[pyr.z == z]
    for zc in (8, 7):
        child = pyr[pyr.z == zc + 1]
        px_x = (child.x % 2) * (px // 2) + child.px_x // 2
        px_y = (child.y % 2) * (px // 2) + child.px_y // 2
        exp = (
            pd.DataFrame(
                {"x": child.x // 2, "y": child.y // 2, "px_x": px_x, "px_y": px_y,
                 "cnt": child.cnt}
            )
            .groupby(["x", "y", "px_x", "px_y"], as_index=False)
            .cnt.sum()
        )
        got = pyr[pyr.z == zc][["x", "y", "px_x", "px_y", "cnt"]]
        key = ["x", "y", "px_x", "px_y"]
        got = got.sort_values(key).reset_index(drop=True)
        exp = exp.sort_values(key).reset_index(drop=True)
        assert len(got) == len(exp)
        assert (got.to_numpy() == exp.to_numpy()).all()
    assert base.cnt.sum() == n_pts


# --------------------------------------------------------------- repetition
def _brute_repetition(text: str, ns=(2, 3)):
    words = text.strip().split()
    out = {}
    for n in ns:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            out[f"dup_{n}gram_frac"] = 0.0
            out[f"top_{n}gram_frac"] = 0.0
            continue
        from collections import Counter

        c = Counter(grams)
        tot = sum(c.values())
        out[f"dup_{n}gram_frac"] = round((tot - len(c)) / tot, 6)
        out[f"top_{n}gram_frac"] = round(max(c.values()) / tot, 6)
    return out


def test_repetition_signals_brute_force(spark):
    from fagi_gis_spark.functions.text import repetition_signals

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(40)
    got = repetition_signals(docs).toPandas().set_index("doc_id").sort_index()
    src = docs.select("doc_id", "text").toPandas()
    for _, r in src.iterrows():
        exp = _brute_repetition(r.text)
        for k, v in exp.items():
            assert got.loc[r.doc_id, k] == pytest.approx(v, abs=1e-9), (r.doc_id, k)


def test_repetition_gate_flags_spam(spark):
    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 1
    spam = "buy now " * 30  # one dominating 2-gram, massive dup 3-grams
    short = "word"
    df = spark.createDataFrame(
        [(0, clean), (1, spam), (2, short)], "doc_id long, text string"
    )
    from fagi_gis_spark.functions.text import repetition_signals

    got = repetition_signals(df).toPandas().set_index("doc_id")
    assert len(got) == 3  # short doc (no grams) still present
    assert got.loc[0, "repetition_ok"] == 1
    assert got.loc[1, "repetition_ok"] == 0
    assert got.loc[1, "top_2gram_frac"] > 0.4
    assert got.loc[2, "dup_2gram_frac"] == 0.0 and got.loc[2, "repetition_ok"] == 1


# ----------------------------------------------------------- decontaminate
def test_decontaminate_brute_force(spark):
    from fagi_gis_spark.functions.text import decontaminate

    n = 4
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    got = decontaminate(train, bench, n=n).toPandas().set_index("doc_id").sort_index()

    def grams(t):
        w = t.strip().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    pdf = docs.select("doc_id", "text").toPandas()
    bset = set()
    for _, r in pdf[pdf.doc_id % 7 == 0].iterrows():
        bset |= grams(r.text)
    tr = pdf[pdf.doc_id % 7 != 0]
    assert len(got) == len(tr)
    for _, r in tr.iterrows():
        hits = len(grams(r.text) & bset)
        assert got.loc[r.doc_id, "n_hit_grams"] == hits
        assert got.loc[r.doc_id, "contaminated"] == int(hits > 0)
    # the synthetic corpus must actually exercise both branches
    assert got.contaminated.sum() > 0 or len(tr) < 50


def test_filter_funnel_consistent_with_component_gates(spark):
    """keep == AND of the four gate bits, and each bit reproduces the
    standalone operator's verdict on the same corpus."""
    from fagi_gis_spark.registry import doc_filter_funnel
    from fagi_gis_spark.functions.text import quality_score, repetition_signals

    fn = doc_filter_funnel(spark, SF_TINY).toPandas().set_index("doc_id").sort_index()
    assert (
        fn.keep
        == (fn.quality_ok & fn.repetition_ok & fn.decon_ok & fn.exact_ok)
    ).all()
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    q = (
        quality_score(docs).toPandas().set_index("doc_id").quality >= 70
    ).astype(int)
    r = repetition_signals(docs).toPandas().set_index("doc_id").repetition_ok
    assert (fn.quality_ok == q.loc[fn.index]).all()
    assert (fn.repetition_ok == r.loc[fn.index]).all()
    # eval-slice docs (doc_id % 97 == 0) are excluded from the funnel
    assert (fn.index % 97 != 0).all()


def test_decontaminate_broadcast_plan(spark):
    """The benchmark gram set must broadcast — the corpus side never
    shuffles for the join (scale contract of the operator)."""
    from fagi_gis_spark.functions.text import decontaminate

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = decontaminate(
        docs.filter("doc_id % 7 != 0"), docs.filter("doc_id % 7 = 0"), n=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------ bigram LM score
def _lm_reference(texts: dict[int, str], ref_mod: int, alpha: float, thr: float):
    """Pure-Python add-alpha bigram LM — the differential oracle."""
    import math
    from collections import Counter

    def bigrams(t):
        w = t.strip().split()
        return list(zip(w, w[1:]))

    cb, cu, succ = Counter(), Counter(), set()
    for did, t in texts.items():
        if did % ref_mod == 0:
            for w1, w2 in bigrams(t):
                cb[(w1, w2)] += 1
                cu[w1] += 1
                succ.add(w2)
    v = len(succ)
    out = {}
    for did, t in texts.items():
        qs = []
        for w1, w2 in bigrams(t):
            p = (cb.get((w1, w2), 0) + alpha) / (cu.get(w1, 0) + alpha * v)
            # round-half-up like Spark/DuckDB round() on positives
            qs.append(math.floor(-math.log(p) * 1e6 + 0.5))
        n, s = len(qs), sum(qs)
        out[did] = (n, s, int(s <= thr * 1e6 * n), int(did % ref_mod == 0))
    return out


def test_bigram_lm_score_matches_python_reference(spark):
    from fagi_gis_spark.functions.text import bigram_lm_score

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for i in range(120)
    }
    texts[7] = "solo"          # single token: no bigrams
    texts[8] = ""              # empty doc
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {
        r.doc_id: (r.n_bigrams, r.nll_micro, r.lm_ok, r.is_ref)
        for r in bigram_lm_score(
            sdf, ref_mod=5, alpha_micro=100_000, max_avg_nll_micro=3_000_000
        ).collect()
    }
    want = _lm_reference(texts, ref_mod=5, alpha=0.1, thr=3.0)
    assert got == want
    # the gate actually splits on this fixture
    oks = {v[2] for v in got.values()}
    assert oks == {0, 1}
    # evidence-free docs pass
    assert got[7] == (0, 0, 1, 0) and got[8][2] == 1


def test_bigram_lm_score_ref_tables_broadcast(spark):
    from fagi_gis_spark.functions.text import bigram_lm_score

    texts = {i: f"a b c d e w{i % 7} a b" for i in range(60)}
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = bigram_lm_score(sdf, ref_mod=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 60


# ------------------------------------------------------------------ BPE
def _bpe_train_ref(texts, num_merges):
    """Independent pure-Python reference of the published algorithm
    (word-freq table, overlap-counted pair stats, max-count /
    lexicographic-min tie-break, left-to-right non-overlapping rewrite)."""
    from collections import Counter

    from fagi_gis_spark.functions.bpe import END

    wf = Counter(w for t in texts for w in t.strip().split() if w)
    vocab = {w: tuple(list(w) + [END]) for w in wf}
    merges = []
    for rank in range(num_merges):
        stats = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wf[w]
        if not stats:
            break
        c = max(stats.values())
        p1, p2 = min(p for p, v in stats.items() if v == c)
        merges.append((rank, p1, p2, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges, vocab


def test_bpe_train_matches_reference_and_encode_replays(spark):
    from fagi_gis_spark.functions.bpe import bpe_tokenize, bpe_train

    rng = np.random.default_rng(31)
    roots = ["lower", "newest", "widest", "low", "new", "wide", "est", "er"]
    texts = [
        " ".join(rng.choice(roots, size=int(rng.integers(1, 12))))
        for _ in range(80)
    ] + ["", "   "]
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = bpe_train(sdf, num_merges=24)
    want, vocab = _bpe_train_ref(texts, 24)
    assert got == want  # identical merge sequence incl. weighted counts
    # tokenization: rank-greedy encode == training-final segmentation
    tok = {
        r.doc_id: (r.n_tokens_bpe, r.n_words)
        for r in bpe_tokenize(sdf, got).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.strip().split() if w]
        expect = sum(len(vocab[w]) for w in words)
        assert tok[i] == (expect, len(words))


def test_bpe_zero_merges_is_chars(spark):
    from fagi_gis_spark.functions.bpe import bpe_tokenize

    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["abc de"]}))
    row = bpe_tokenize(sdf, []).collect()[0]
    # chars + </w> per word: (3+1) + (2+1)
    assert (row.n_tokens_bpe, row.n_words) == (7, 2)


# ------------------------------------------------------------------ PII scrub
def test_pii_scrub_hand_cases(spark):
    import pandas as pd

    from fagi_gis_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "mail a.b-c_d%x+1@sub.example.co.uk and e@f.io today",
                    "host 192.168.0.1 then 10.0.255.254 end",
                    "call +1 555 0100 1234 or +491 1234 5678 9012 0000 now",
                    "no pii here at all",
                    # email whose host looks dotted-quad-ish: email rule
                    # must win (it runs first)
                    "u@1.2.3.4ab plus bare 1.2.3.4",
                ],
            }
        )
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text_scrubbed == "mail <EMAIL> and <EMAIL> today"
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 0, 0)
    assert out[2].text_scrubbed == "host <IP> then <IP> end"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 2, 0)
    assert out[3].text_scrubbed == "call <PHONE> or <PHONE> now"
    assert out[3].n_phone == 2
    assert out[4].text_scrubbed == "no pii here at all"
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)
    # "u@1.2.3.4ab": no letter TLD after a dot -> NOT an email; the
    # embedded quad "1.2.3.4" is followed by a word char so \b rejects
    # it too — only the bare quad redacts (conservative by design: a
    # malformed address is left for the quality gates, never
    # half-redacted into a different string)
    assert out[5].text_scrubbed == "u@1.2.3.4ab plus bare <IP>"
    assert (out[5].n_email, out[5].n_ipv4) == (0, 1)
