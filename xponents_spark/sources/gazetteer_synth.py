"""Deterministic synthetic gazetteer at reference scale.

The reference's production gazetteer is ~25M taggable names conflated from
NGA/USGS/Geonames (``/root/reference/solr/README.md:60-69,164-166``).  Those
sources aren't in this sandbox, so this module synthesizes a raw gazetteer
with the same *shape* for scale testing:

* schema of the Solr core (``solr/solr7/gazetteer/conf/schema.xml:108-178``):
  place_id, name, name_type, feat_class, feat_code, cc, adm1, lat, lon, pop;
* **Zipf name collisions**: ~20% of rows draw from a shared pool with a
  cubed-uniform skew, so a few names recur across thousands of places in
  many countries (the London/Springfield problem at scale) — hot keys for
  both the tagger's candidate sets and any downstream joins;
* duplicated rows (exercises the ETL dedup window), code/abbreviation
  variants, a deterministic population gradient.

Everything is JVM-side expressions over ``spark.range`` — generation is
distributed, shuffle-free, and bit-deterministic (Murmur3 ``F.hash`` with
literal seeds; no Python, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SYL = ("ka", "ri", "ton", "mas", "bel", "dor", "san", "ver", "mon", "gra",
        "lin", "pol", "tar", "nov", "hill", "ford", "bury", "ville", "stan",
        "ber", "cas", "tel", "mar", "por", "vis", "lak", "ran", "del", "fen",
        "ost", "wick", "ham", "shi", "kyo", "nan", "pur", "bad", "abad",
        "grad", "sk", "holm", "dal", "vik", "by", "borg", "mir", "pol",
        "chester", "field", "brook", "dale", "mount", "spring", "clear",
        "fair", "green", "west", "east", "north", "south", "new", "old",
        "san", "el")

_CCS = ("US", "GB", "FR", "DE", "ES", "IT", "RU", "CN", "JP", "IN", "BR",
        "CA", "AU", "MX", "AR", "CL", "CO", "PE", "VE", "EG", "ZA", "NG",
        "KE", "MA", "DZ", "TR", "IR", "IQ", "SA", "PK", "BD", "TH", "VN",
        "ID", "MY", "PH", "KR", "TW", "UA", "PL", "RO", "NL", "BE", "SE",
        "NO", "FI", "DK", "AT", "CH", "PT", "GR", "CZ", "HU", "IE", "NZ",
        "AF", "SY", "JO", "LB", "IL")


def _syl_expr(h: F.Column) -> F.Column:
    arr = F.array(*[F.lit(s) for s in _SYL])
    return F.element_at(arr, (F.pmod(h, F.lit(len(_SYL))) + 1).cast("int"))


def _name_expr(key: F.Column, salt: int) -> F.Column:
    """2-4 syllables + capitalization, fully determined by (key, salt)."""
    h = lambda k: F.hash(key, F.lit(salt), F.lit(k))
    n_syl = F.pmod(h(0), F.lit(3)) + 2
    body = F.concat(
        _syl_expr(h(1)), _syl_expr(h(2)),
        F.when(n_syl >= 3, _syl_expr(h(3))).otherwise(F.lit("")),
        F.when(n_syl >= 4, _syl_expr(h(4))).otherwise(F.lit("")))
    return F.initcap(body)


def synthesize_gazetteer_raw(spark: SparkSession, n_rows: int = 1_200_000,
                             seed: int = 42,
                             collision_pool: int = 20_000,
                             partitions: int = 32) -> DataFrame:
    """Raw gazetteer rows, ready for :func:`gazetteer_etl.gazetteer_etl`."""
    df = spark.range(0, n_rows, 1, partitions)
    i = F.col("id")
    h = lambda k: F.hash(i, F.lit(seed), F.lit(k))
    u = lambda k: (F.pmod(h(k), F.lit(1_000_000)) / F.lit(1_000_000.0))

    # Zipf-ish collisions: 20% of rows take a pool name; pool index is
    # cubed-uniform so index 0..few dominate (name shared by 1000s of rows)
    pool_idx = F.floor(F.pow(u(1), F.lit(3.0)) * collision_pool).cast("bigint")
    unique_name = _name_expr(i, 100)
    pool_name = _name_expr(pool_idx, 200)
    # 2% CJK names (2-3 han chars): exercises the per-character phrase keys
    # of the tagger index at scale, like the reference's CJK fields
    cjk_chars = F.array(*[F.lit(c) for c in "北京都東海南西山川口市区街村関"])
    cjk_pick = lambda k: F.element_at(
        cjk_chars, (F.pmod(h(20 + k), F.lit(15)) + 1).cast("int"))
    cjk_name = F.concat(cjk_pick(0), cjk_pick(1),
                        F.when(F.pmod(h(23), F.lit(2)) == 0, cjk_pick(2))
                         .otherwise(F.lit("")))
    name = (F.when(u(3) < 0.02, cjk_name)
             .when(u(2) < 0.20, pool_name)
             .otherwise(unique_name))

    cc_arr = F.array(*[F.lit(c) for c in _CCS])
    cc = F.element_at(cc_arr, (F.pmod(h(3), F.lit(len(_CCS))) + 1).cast("int"))
    adm1 = F.pmod(h(4), F.lit(30)).cast("string")

    feat_sel = F.pmod(h(5), F.lit(100))
    feat_class = (F.when(feat_sel < 85, "P")
                   .when(feat_sel < 95, "A")
                   .otherwise("H"))
    feat_code = (F.when(feat_sel < 80, "PPL")
                  .when(feat_sel < 85, "PPLA")
                  .when(feat_sel < 93, "ADM2")
                  .when(feat_sel < 95, "ADM1")
                  .otherwise("LK"))

    # population gradient: mostly small, decade-stepped up to ~10M
    pop = F.pow(F.lit(10.0), (F.pmod(h(6), F.lit(70)) / F.lit(10.0))).cast("bigint")

    lat = (F.pmod(h(7), F.lit(170_000)) / F.lit(1000.0)) - 85.0
    lon = (F.pmod(h(8), F.lit(360_000)) / F.lit(1000.0)) - 180.0

    base = df.select(
        F.concat(F.lit("S"), i).alias("place_id"),
        name.alias("name"),
        F.lit("N").alias("name_type"),
        feat_class.alias("feat_class"),
        feat_code.alias("feat_code"),
        cc.alias("cc"), adm1.alias("adm1"),
        F.round(lat, 3).alias("lat"), F.round(lon, 3).alias("lon"),
        pop.alias("pop"))

    # 5% duplicated rows (ETL dedup window must collapse them) and 5%
    # UPPER-code variants of the same places (exercises name_type=C path)
    dups = base.filter(F.pmod(F.hash("place_id", F.lit(seed + 1)), F.lit(20)) == 0)
    codes = (base.filter(F.pmod(F.hash("place_id", F.lit(seed + 2)), F.lit(20)) == 0)
                 .filter(F.col("feat_class") == "A")
                 .withColumn("name", F.upper(F.substring("name", 1, 3)))
                 .withColumn("name_type", F.lit("C")))
    return base.unionAll(dups).unionAll(codes)


def synthesize_postal_raw(spark: SparkSession, n_rows: int = 500_000,
                          seed: int = 77, partitions: int = 32) -> DataFrame:
    """Deterministic postal tuples in the reference's shape (~4M unique
    COUNTRY+CODE, PostalGeocoder.java:25-33): numeric 4-5 digit codes keyed
    to (cc, adm1) with coordinates.  JVM-side expressions only."""
    df = spark.range(0, n_rows, 1, partitions)
    i = F.col("id")
    h = lambda k: F.hash(i, F.lit(seed), F.lit(k))
    cc_arr = F.array(*[F.lit(c) for c in _CCS])
    cc = F.element_at(cc_arr, (F.pmod(h(1), F.lit(len(_CCS))) + 1).cast("int"))
    adm1 = F.pmod(h(2), F.lit(30)).cast("string")
    code = F.lpad(F.pmod(h(3), F.lit(90_000)) + 10_000, 5, "0").cast("string")
    lat = (F.pmod(h(4), F.lit(170_000)) / F.lit(1000.0)) - 85.0
    lon = (F.pmod(h(5), F.lit(360_000)) / F.lit(1000.0)) - 180.0
    return df.select(
        cc.alias("cc"), adm1.alias("adm1"), code.alias("code"),
        _name_expr(i, 300).alias("name"),
        F.round(lat, 3).alias("lat"), F.round(lon, 3).alias("lon"))
