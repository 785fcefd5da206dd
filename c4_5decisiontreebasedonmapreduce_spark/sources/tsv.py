"""Reader for the reference's native training-input format.

The reference consumes (a) a tab-separated training table — one sample per
line, last column the class label (`/root/reference/src/program/MyMapper.java:28-44`)
— and (b) an "attributes" schema side-file, one colon-delimited line per
attribute, last line the class declaration
(`/root/reference/src/program/Main.java:137-166`):

    outlook:string:sunny,overcast,rainy     # categorical, enumerated domain
    temperature:numeric                     # numeric (double)
    play:yes,no                             # class (last line)

Here the side-file becomes a typed :class:`TrainingSchema` and the TSV is
read via ``spark.read.text`` + a ``\\t+`` regexp split projected onto the
schema's typed columns — the reference's exact row-parse semantics
(`String.split("\\t+")`, `MyMapper.java:30`: RUNS of tabs collapse, so a
doubled tab never yields an empty field) while numeric columns still
arrive as doubles (the reference re-parses strings per row,
`MyMapper.java:98-102`) and the whole projection stays inside codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

CATEGORICAL = "categorical"
NUMERIC = "numeric"


@dataclass(frozen=True)
class AttributeSpec:
    """One feature column: categorical with a closed, enumerated domain
    (splits create one child per *declared* value, even values absent from
    the data — `Main.java:110-116`) or numeric (double, binary splits)."""

    name: str
    kind: str  # CATEGORICAL | NUMERIC
    domain: tuple[str, ...] = field(default=())

    @property
    def is_numeric(self) -> bool:
        return self.kind == NUMERIC


@dataclass(frozen=True)
class TrainingSchema:
    features: tuple[AttributeSpec, ...]
    label: str
    label_domain: tuple[str, ...]

    @property
    def categorical(self) -> tuple[AttributeSpec, ...]:
        return tuple(a for a in self.features if not a.is_numeric)

    @property
    def numeric(self) -> tuple[AttributeSpec, ...]:
        return tuple(a for a in self.features if a.is_numeric)

    def spark_schema(self) -> StructType:
        fields = [
            StructField(
                a.name, DoubleType() if a.is_numeric else StringType(), True
            )
            for a in self.features
        ]
        fields.append(StructField(self.label, StringType(), True))
        return StructType(fields)


def parse_attributes_lines(lines: list[str]) -> TrainingSchema:
    """Parse the side-file's lines. Mirrors `Main.java:137-166`: a line with
    kind tag ``string`` is categorical with an enumerated domain; any other
    two-field line is numeric; the last line is ``label:c1,c2,...``."""
    lines = [ln.strip() for ln in lines if ln.strip()]
    if len(lines) < 2:
        raise ValueError("attributes file needs >=1 feature line + class line")
    feats: list[AttributeSpec] = []
    for ln in lines[:-1]:
        parts = ln.split(":")
        if len(parts) >= 3 and parts[1] == "string":
            feats.append(
                AttributeSpec(parts[0], CATEGORICAL, tuple(parts[2].split(",")))
            )
        else:
            feats.append(AttributeSpec(parts[0], NUMERIC))
    name, _, domain = lines[-1].partition(":")
    return TrainingSchema(tuple(feats), name, tuple(domain.split(",")))


def parse_attributes_file(path: str | Path) -> TrainingSchema:
    return parse_attributes_lines(Path(path).read_text().splitlines())


def read_training_tsv(
    spark: SparkSession, path: str, schema: TrainingSchema
) -> DataFrame:
    """Typed scan of a reference-format TSV training table.

    Splits each line on RUNS of tabs (``\\t+``) exactly like the
    reference's ``String.split("\\t+")`` (`MyMapper.java:30`) — on a
    malformed file with doubled tabs the fields shift left instead of
    becoming nulls, matching the reference bit-for-bit; well-formed files
    are identical to a plain single-tab CSV read. The split + typed
    element_at projection is pure Column code, so it whole-stage-codegens
    like the csv reader did."""
    parts = F.split(F.col("value"), r"\t+")
    fields = schema.spark_schema().fields
    return spark.read.text(path).select(
        *[
            F.element_at(parts, i + 1).cast(f.dataType).alias(f.name)
            for i, f in enumerate(fields)
        ]
    )


def tsv_ingest_audit(
    spark: SparkSession, path: str, schema: TrainingSchema, d=None
) -> DataFrame:
    """Malformed-row AUDIT of a reference-format TSV — the explicit
    accounting for everything the reference's parser does SILENTLY
    (`MyMapper.java:30`, ``String.split("\\t+")``): a doubled tab
    collapses (an intended empty field is swallowed and every later
    field shifts left), a short row leaves trailing columns unparsed,
    a long row drops its tail, and a non-numeric token in a numeric
    column becomes whatever ``Double.parseDouble`` throws into the
    task. One row per category: ``exact`` (single-tab field count
    matches the schema), ``collapsed_empty_fields`` (the reference's
    tab-run view matches but the raw view does not — silent left
    shift), ``short_row``, ``long_row``, plus
    ``numeric_parse_failures`` counting rows whose tab-run fields DO
    line up but a numeric column fails to cast. Every category the
    audit flags is a row the reference would train on incorrectly
    without a word.

    The tab-run view uses JAVA ``String.split`` limit-0 semantics —
    trailing empty strings are DROPPED (``"x\\ty\\t\\t".split("\\t+")``
    is ``["x","y"]``, length 2, and an all-tab line splits to length 0)
    — because that is exactly what `MyMapper.java:30` sees: a row with
    trailing tabs IS a short row to the reference, even though its
    single-tab field count matches the schema. Spark's ``split`` keeps
    the trailing empty, so the run view strips trailing tab-runs first
    and special-cases the two Java quirks (empty line → length 1,
    all-tab line → length 0). The reference's view is checked FIRST in
    the classification: a line only counts ``exact`` when both the
    tab-run view and the raw single-tab view line up.

    One projection + a 5-cell aggregate over the text scan — the audit
    costs one pass, which is why it belongs at ingest. Pass ``d`` (a
    ``value``-column relation) to audit injected lines in tests."""
    if d is None:
        d = spark.read.text(path)
    n_fields = len(schema.spark_schema().fields)
    raw = F.size(F.split(F.col("value"), r"\t", -1))
    # Java split("\t+") limit 0: runs collapse AND trailing empties drop
    runs = (
        F.when(F.col("value") == "", F.lit(1))  # "".split() → [""]
        .when(F.col("value").rlike(r"^\t+$"), F.lit(0))  # all-tab → []
        .otherwise(
            F.size(
                F.split(
                    F.regexp_replace(F.col("value"), r"\t+$", ""), r"\t+"
                )
            )
        )
    )
    numeric_ok = F.lit(True)
    parts = F.split(F.col("value"), r"\t+")
    for i, f in enumerate(schema.spark_schema().fields):
        if f.dataType.typeName() == "double":
            # try_cast: ANSI mode makes a plain cast THROW on malformed
            # input — the audit must count bad tokens, not die on them
            numeric_ok = numeric_ok & F.element_at(
                parts, i + 1
            ).try_cast("double").isNotNull()
    aligned = (runs == n_fields) & (raw == n_fields)
    category = (
        F.when(aligned & ~numeric_ok, "numeric_parse_failures")
        .when(aligned, "exact")
        .when((runs == n_fields) & (raw > n_fields), "collapsed_empty_fields")
        .when(runs < n_fields, "short_row")
        .otherwise("long_row")
    )
    return (
        d.select(category.alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n_rows"))
    )
