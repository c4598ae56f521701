"""Spark schemas: transcripts input + the extraction output match struct.

The match struct mirrors the reference's REST annotation schema
(``/root/reference/src/main/java/org/opensextant/output/Transforms.java``:
base fields :285-297, geo fields :174-226, date fields :380-391, taxon
fields :362-368) flattened into one nullable-wide struct — flat columns keep
Arrow transfer cheap and make match explosion (for joins/aggregations over
matches) a zero-copy ``explode`` instead of nested field extraction.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

MATCH_STRUCT = T.StructType([
    # TextMatch core (Transforms.java:285-297)
    T.StructField("span_start", T.IntegerType(), False),
    T.StructField("span_end", T.IntegerType(), False),
    T.StructField("matchtext", T.StringType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("pattern_id", T.StringType(), True),
    T.StructField("filtered_out", T.BooleanType(), False),
    T.StructField("confidence", T.IntegerType(), True),
    # geo (Transforms.java:174-226)
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("prec", T.IntegerType(), True),
    T.StructField("geohash", T.StringType(), True),
    T.StructField("cc", T.StringType(), True),
    T.StructField("adm1", T.StringType(), True),
    # ProvinceNameSetter (PlaceGeocoder.java:523-525; 'province-name',
    # Transforms.java:226): resolved ADM1 display name
    T.StructField("adm1_name", T.StringType(), True),
    T.StructField("feat_class", T.StringType(), True),
    T.StructField("feat_code", T.StringType(), True),
    T.StructField("place_id", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    # K12 second choice (choose top-2, PlaceCandidate.java:331-397):
    # runner-up location for downstream disambiguation audits
    T.StructField("alt_place_id", T.StringType(), True),
    T.StructField("alt_cc", T.StringType(), True),
    # confidence gap to the runner-up assessed as-if-chosen (0 = tie —
    # the ambiguity case K13's distance qualifiers penalize)
    T.StructField("alt_conf_delta", T.IntegerType(), True),
    T.StructField("method", T.StringType(), True),
    # temporal (Transforms.java:380-391)
    T.StructField("date_norm", T.StringType(), True),
    T.StructField("epoch", T.LongType(), True),
    T.StructField("resolution", T.StringType(), True),
    # taxon (Transforms.java:362-368)
    T.StructField("taxon", T.StringType(), True),
    T.StructField("catalog", T.StringType(), True),
    # coordinate enrichment: top-5 nearby place names, nearest first
    # ('nearest_places', PlaceGeocoder.java:917-941, Transforms.java:174-226)
    T.StructField("nearest_places", T.ArrayType(T.StringType()), True),
    # FlexPat named slot values (SURVEY §1.2 match struct 'slots')
    T.StructField("slots", T.MapType(T.StringType(), T.StringType()), True),
    # classifier flags: date 'distant-past'/'future' (DateMatch.html
    # isDistantPast/isFuture relative to a caller-set TODAY)
    T.StructField("flags", T.ArrayType(T.StringType()), True),
])

MATCH_FIELD_NAMES = [f.name for f in MATCH_STRUCT.fields]


def extraction_output_schema(input_schema: T.StructType) -> T.StructType:
    """Input columns + ``main_text`` + ``matches`` array."""
    fields = list(input_schema.fields)
    fields.append(T.StructField("main_text", T.StringType(), True))
    fields.append(T.StructField("matches", T.ArrayType(MATCH_STRUCT), True))
    return T.StructType(fields)
