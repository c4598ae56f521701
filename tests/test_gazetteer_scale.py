"""Scale-path gazetteer: synth generator -> ETL -> tagger parquet ->
executor-side ParquetGazetteerIndex / CompactSpatialIndex, with parity
against the in-memory PhraseIndex on identical rows (VERDICT r1 item 3)."""

import numpy as np
import pytest

from xponents_spark.gazetteer import matcher
from xponents_spark.gazetteer.matcher import PhraseIndex, Place
from xponents_spark.sources.gazetteer_etl import (build_tagger_parquet,
                                                  gazetteer_etl)
from xponents_spark.sources.gazetteer_synth import synthesize_gazetteer_raw


@pytest.fixture(scope="module")
def tagger_pq(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gaz") / "tagger.parquet")
    raw = synthesize_gazetteer_raw(spark, n_rows=20_000, partitions=8)
    build_tagger_parquet(gazetteer_etl(raw), out)
    return out


def test_synth_is_deterministic_and_collides(spark):
    a = synthesize_gazetteer_raw(spark, 5_000, partitions=4).collect()
    b = synthesize_gazetteer_raw(spark, 5_000, partitions=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    names = [r["name"] for r in a]
    top = max(names, key=names.count)
    # Zipf pool: the hottest name recurs across many places/countries
    assert names.count(top) > 20
    ccs = {r["cc"] for r in a if r["name"] == top}
    assert len(ccs) > 5


def test_parquet_index_matches_phrase_index(spark, tagger_pq):
    """Same rows -> ParquetGazetteerIndex.scan == PhraseIndex.scan
    (spans and place_id sets) on texts containing known names."""
    from xponents_spark.gazetteer.store import ParquetGazetteerIndex

    rows = spark.read.parquet(tagger_pq).collect()
    cols = ["place_id", "name", "name_type", "feat_class", "feat_code",
            "cc", "adm1", "lat", "lon", "id_bias", "pop"]
    mem = PhraseIndex([(r["name"], Place(*[r[c] for c in cols]))
                       for r in rows])
    pq_idx = ParquetGazetteerIndex(tagger_pq)

    sample = [r["name"] for r in rows[:50]]
    for name in sample:
        text = f"we visited {name} on the way home"
        a = [(s, e, m, sorted(p.place_id for p in pl))
             for s, e, m, pl in mem.scan(text)]
        b = [(s, e, m, sorted(p.place_id for p in pl))
             for s, e, m, pl in pq_idx.scan(text)]
        assert a == b, name


def test_extract_with_parquet_gazetteer(spark, tagger_pq):
    """The Spark path: workers read the tagger parquet directly (no driver
    collect) and tag a known synthetic name."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from xponents_spark.pipeline import extract
    from xponents_spark.schemas import TRANSCRIPT_SCHEMA

    name = spark.read.parquet(tagger_pq) \
        .filter("name_type = 'N' AND length(name) >= 8") \
        .orderBy("place_id").first()["name"]
    rows = [Row(conv_id="c0", turn_idx=i, role="user",
                text=f"meeting in {name} tomorrow", tool=None,
                ts=datetime.datetime(2025, 1, 1)) for i in range(8)]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = extract(df, features=("places", "countries"),
                  gazetteer_parquet=tagger_pq)
    got = (out.select(F.explode("matches").alias("m"))
              .filter(F.col("m.label").isin("place", "country"))
              .select("m.matchtext").collect())
    assert len(got) == 8
    assert all(r["matchtext"] == name for r in got)


def test_compact_spatial_matches_reference_impl(spark, tagger_pq):
    from xponents_spark.gazetteer.spatial import SpatialIndex
    from xponents_spark.gazetteer.store import CompactSpatialIndex

    rows = spark.read.parquet(tagger_pq).collect()
    cols = ["place_id", "name", "name_type", "feat_class", "feat_code",
            "cc", "adm1", "lat", "lon", "id_bias", "pop"]
    mem = SpatialIndex([Place(*[r[c] for c in cols]) for r in rows])
    cmp_idx = CompactSpatialIndex(tagger_pq)
    rng = np.random.RandomState(7)
    for _ in range(40):
        lat = float(rng.uniform(-80, 80))
        lon = float(rng.uniform(-175, 175))
        a = [(round(d), p.place_id) for d, p in mem.places_at(lat, lon, 50)]
        b = [(round(d), p.place_id) for d, p in cmp_idx.places_at(lat, lon, 50)]
        # same distances; id tie-breaks may differ between impls
        assert [x[0] for x in a] == [x[0] for x in b]
        assert {x[1] for x in a} == {x[1] for x in b} or a == b


def test_parquet_gazetteer_resets_cleanly(tagger_pq):
    matcher.set_gazetteer_parquet(tagger_pq)
    try:
        idx = matcher.gaz_index()
        assert idx.loc   # built from parquet
    finally:
        matcher.set_gazetteer_parquet(None)
    # back to the embedded fixture gazetteer
    assert matcher.gaz_index().scan("the London office") != []


def test_postal_parquet_path(spark, tmp_path_factory):
    """Parquet-backed postal table: worker-side load, reset semantics, and
    an end-to-end tag against a synthesized code."""
    from xponents_spark.gazetteer import postal
    from xponents_spark.sources.gazetteer_synth import synthesize_postal_raw

    out = str(tmp_path_factory.mktemp("postal") / "postal.parquet")
    synthesize_postal_raw(spark, n_rows=5_000, partitions=4) \
        .write.mode("overwrite").parquet(out)
    try:
        postal.set_postal_parquet(out)
        assert postal._BY_CODE is None   # lazy until first lookup
        assert len(postal._codes()) > 3_000
        row = spark.read.parquet(out).first()
        # a code adjacent to country scope resolves through the big table
        hits = postal.tag_postals(f"parcel code {row['code']} sent", [],
                                  {row["cc"]})
        assert any(h["cc"] == row["cc"] and h["matchtext"] == row["code"]
                   for h in hits)
    finally:
        postal.set_postal_parquet(None)
    assert len(postal._codes()) == len(postal.POSTAL_ROWS)


def test_taxcat_parquet_path(spark, tmp_path_factory):
    """T4 scale artifact (VERDICT r2 item 7): synth JRC/person-scale
    lexicon -> ETL -> parquet -> worker-side index; known names tag, the
    valid:false gate holds, and reset semantics restore the embedded
    lexicons."""
    from xponents_spark.sources.taxcat_etl import (build_taxcat_parquet,
                                                   synthesize_taxcat_raw,
                                                   taxcat_etl)

    out = str(tmp_path_factory.mktemp("taxcat") / "taxcat.parquet")
    raw = synthesize_taxcat_raw(spark, n_rows=40_000, partitions=8)
    build_taxcat_parquet(taxcat_etl(raw), out)

    rows = spark.read.parquet(out).collect()
    assert len(rows) > 1_000
    valid = next(r for r in rows if r["valid"])
    try:
        matcher.set_taxcat_parquet(out)
        hits = matcher.tag_taxons(f"meeting with {valid['name']} tomorrow")
        assert any(m == valid["name"] and k == valid["kind"]
                   for _s, _e, m, k, _c, _cc in hits)
        # an invalid row whose name is not also a valid entry must not tag
        valid_names = {r["name"].lower() for r in rows if r["valid"]}
        bad = next((r for r in rows
                    if not r["valid"] and r["name"].lower() not in valid_names),
                   None)
        if bad is not None:
            hits = matcher.tag_taxons(f"meeting with {bad['name']} tomorrow")
            assert not any(m == bad["name"]
                           for _s, _e, m, _k, _c, _cc in hits)
    finally:
        matcher.set_taxcat_parquet(None)
    # embedded lexicons restored
    assert matcher.tag_taxons("the Australian delegation")


def test_taxcat_parquet_matches_embedded(spark, tmp_path_factory):
    """Embedded lexicons written through the taxcat ETL produce the exact
    same taxon tags as the in-memory path (the driver-gate equivalence)."""
    from xponents_spark.sources.taxcat_etl import (build_taxcat_parquet,
                                                   embedded_taxcat_df)

    out = str(tmp_path_factory.mktemp("taxcat_emb") / "taxcat.parquet")
    build_taxcat_parquet(embedded_taxcat_df(spark).repartition(1)
                         .sortWithinPartitions("kind", "name"), out)
    probe = ("Mr Smith of Acme Corporation met the Australian envoy "
             "and French officials in town")
    base = matcher.tag_taxons(probe)
    try:
        matcher.set_taxcat_parquet(out)
        assert matcher.tag_taxons(probe) == base
    finally:
        matcher.set_taxcat_parquet(None)


def test_postal_mmap_path(spark, tmp_path_factory):
    """Keyed mmap postal table: same tags as the parquet-dict path for the
    same rows, O(1) private heap (the 4M-tuple reference-scale answer)."""
    from xponents_spark.gazetteer import postal
    from xponents_spark.sources.gazetteer_synth import synthesize_postal_raw

    base = tmp_path_factory.mktemp("postal_mm")
    pq_path = str(base / "postal.parquet")
    mm_path = str(base / "postal.kvmmap")
    synthesize_postal_raw(spark, n_rows=5_000, partitions=4) \
        .write.mode("overwrite").parquet(pq_path)
    meta = postal.build_postal_mmap(pq_path, mm_path)
    assert meta["n_rows"] == spark.read.parquet(pq_path).count()

    row = spark.read.parquet(pq_path).first()
    probe = f"parcel code {row['code']} sent"
    try:
        postal.set_postal_parquet(pq_path)
        via_parquet = postal.tag_postals(probe, [], {row["cc"]})
        postal.set_postal_parquet(mm_path)
        assert postal._BY_CODE is None   # lazy
        via_mmap = postal.tag_postals(probe, [], {row["cc"]})
        assert via_mmap == via_parquet and via_mmap
    finally:
        postal.set_postal_parquet(None)


def test_normalization_version_fingerprint(spark, tmp_path_factory):
    """A tagger parquet built under different normalization semantics is
    refused at load time instead of silently not matching."""
    import json
    import os

    from xponents_spark.gazetteer.store import ParquetGazetteerIndex

    out = str(tmp_path_factory.mktemp("gazv") / "tagger.parquet")
    raw = synthesize_gazetteer_raw(spark, n_rows=500, partitions=2)
    build_tagger_parquet(gazetteer_etl(raw), out)
    meta = os.path.join(out, "_normalization.json")
    assert json.load(open(meta))["normalization_version"] >= 2
    ParquetGazetteerIndex(out)     # current version loads
    json.dump({"normalization_version": 1}, open(meta, "w"))
    with pytest.raises(ValueError, match="normalized with version"):
        ParquetGazetteerIndex(out)


@pytest.fixture(scope="module")
def mmap_dir(tagger_pq, tmp_path_factory):
    from xponents_spark.gazetteer.mmapstore import build_mmap_artifact
    out = str(tmp_path_factory.mktemp("gazmm") / "tagger.mmap")
    meta = build_mmap_artifact(tagger_pq, out)
    assert meta["n_phrases"] > 0 and meta["n_rows"] >= meta["n_phrases"]
    return out


def test_mmap_index_matches_parquet_index(spark, tagger_pq, mmap_dir):
    """Shared-memory path parity: MmapGazetteerIndex.scan must equal
    ParquetGazetteerIndex.scan (spans, matchtext, hydrated places) on texts
    containing known names, multi-token names, and misses."""
    from xponents_spark.gazetteer.mmapstore import MmapGazetteerIndex
    from xponents_spark.gazetteer.store import ParquetGazetteerIndex

    pq_idx = ParquetGazetteerIndex(tagger_pq)
    mm_idx = MmapGazetteerIndex(mmap_dir)
    rows = spark.read.parquet(tagger_pq).limit(80).collect()
    texts = [f"we visited {r['name']} on the way home" for r in rows]
    texts += ["no placenames at all here", "", "a b c d e f g",
              f"{rows[0]['name']} and {rows[1]['name']} twice "
              f"{rows[0]['name']}"]
    for text in texts:
        a = [(s, e, m, sorted((p.place_id, p.cc, p.lat, p.pop) for p in pl))
             for s, e, m, pl in pq_idx.scan(text)]
        b = [(s, e, m, sorted((p.place_id, p.cc, p.lat, p.pop) for p in pl))
             for s, e, m, pl in mm_idx.scan(text)]
        assert a == b, text[:60]


def test_mmap_spatial_matches_compact(spark, tagger_pq, mmap_dir):
    from xponents_spark.gazetteer.mmapstore import MmapSpatialIndex
    from xponents_spark.gazetteer.store import CompactSpatialIndex

    cmp_idx = CompactSpatialIndex(tagger_pq)
    mm_idx = MmapSpatialIndex(mmap_dir)
    rng = np.random.RandomState(11)
    for _ in range(40):
        lat = float(rng.uniform(-80, 80))
        lon = float(rng.uniform(-175, 175))
        a = [(round(d), p.place_id) for d, p in cmp_idx.places_at(lat, lon, 50)]
        b = [(round(d), p.place_id) for d, p in mm_idx.places_at(lat, lon, 50)]
        assert [x[0] for x in a] == [x[0] for x in b]
        assert {x[1] for x in a} == {x[1] for x in b} or a == b


def test_extract_with_mmap_gazetteer(spark, tagger_pq, mmap_dir):
    """End-to-end Spark path over the mmap artifact: gazetteer_parquet may
    point at either artifact kind; workers dispatch on layout."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from xponents_spark.pipeline import extract
    from xponents_spark.schemas import TRANSCRIPT_SCHEMA

    name = spark.read.parquet(tagger_pq) \
        .filter("name_type = 'N' AND length(name) >= 8") \
        .orderBy("place_id").first()["name"]
    rows = [Row(conv_id="c0", turn_idx=i, role="user",
                text=f"meeting in {name} tomorrow", tool=None,
                ts=datetime.datetime(2025, 1, 1)) for i in range(6)]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = extract(df, features=("places", "countries"),
                  gazetteer_parquet=mmap_dir)
    got = (out.select(F.explode("matches").alias("m"))
              .filter(F.col("m.label").isin("place", "country"))
              .select("m.matchtext").collect())
    assert len(got) == 6
    assert all(r["matchtext"] == name for r in got)


def test_mmap_version_fingerprint(tagger_pq, tmp_path_factory):
    import json
    import os

    from xponents_spark.gazetteer.mmapstore import (MmapGazetteerIndex,
                                                    build_mmap_artifact)
    out = str(tmp_path_factory.mktemp("gazmmv") / "tagger.mmap")
    build_mmap_artifact(tagger_pq, out)
    MmapGazetteerIndex(out)
    meta = os.path.join(out, "meta.json")
    m = json.load(open(meta))
    m["normalization_version"] = 1
    json.dump(m, open(meta, "w"))
    # fresh process-level state: drop the shared-file memo for this path
    from xponents_spark.gazetteer import mmapstore
    mmapstore._FILES.pop(out, None)
    with pytest.raises(ValueError, match="normalized with version"):
        MmapGazetteerIndex(out)


def test_cjk_names_tag_through_parquet_index(spark, tmp_path_factory):
    """CJK names in the scale gazetteer index as per-char phrases and tag
    inside unsegmented runs through the parquet-backed index."""
    from xponents_spark.gazetteer.store import ParquetGazetteerIndex

    out = str(tmp_path_factory.mktemp("gazcjk") / "tagger.parquet")
    raw = synthesize_gazetteer_raw(spark, n_rows=30_000, partitions=8)
    build_tagger_parquet(gazetteer_etl(raw), out)
    cjk = (spark.read.parquet(out)
           .filter("name rlike '[\\\\x{4e00}-\\\\x{9fff}]'").limit(5).collect())
    assert cjk, "synth should emit CJK names"
    idx = ParquetGazetteerIndex(out)
    for r in cjk:
        hits = idx.scan(f"前往{r['name']}旅行")
        assert any(m == r["name"] for _s, _e, m, _p in hits), r["name"]


def test_taxcat_mmap_parity(spark, tmp_path):
    """The taxcat mmap artifact must tag IDENTICALLY to the parquet dict
    path over the fixture payload texts (same phrases, spans, payloads)."""
    from xponents_spark.gazetteer import matcher
    from xponents_spark.gazetteer.mmapstore import (build_taxcat_mmap,
                                                    is_tax_mmap)
    from xponents_spark.sources.payloads import PAYLOADS
    from xponents_spark.sources.taxcat_etl import (build_taxcat_parquet,
                                                   embedded_taxcat_df)

    pq_dir = str(tmp_path / "taxcat.parquet")
    build_taxcat_parquet(
        embedded_taxcat_df(spark).repartition(1)
        .sortWithinPartitions("kind", "name"), pq_dir)
    mm_dir = str(tmp_path / "taxcat.mmap")
    meta = build_taxcat_mmap(pq_dir, mm_dir)
    assert is_tax_mmap(mm_dir) and meta["n_rows"] > 0

    texts = [body for _kind, body in PAYLOADS if body] + [
        "Dr. Maria Santos of the World Health Organization met the "
        "Brazilian delegation",
        "", "no entities here at all"]
    try:
        matcher.set_taxcat_parquet(pq_dir)
        a = [matcher.tag_taxons(t) for t in texts]
        matcher.set_taxcat_parquet(mm_dir)
        b = [matcher.tag_taxons(t) for t in texts]
    finally:
        matcher.set_taxcat_parquet(None)
    assert a == b
    assert any(a)    # fixtures actually contain taxons
