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
read through ``spark.read.csv`` with an explicit ``StructType`` — so numeric
columns arrive as doubles (the reference re-parses strings per row,
`MyMapper.java:98-102`) and Catalyst can prune/push down.

Divergence note (SURVEY.md Q-ledger): the reference splits rows on ``\\t+``
(runs of tabs collapse, `MyMapper.java:30`); we treat a single tab as the
delimiter — well-formed files behave identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
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
    """Typed scan of a reference-format TSV training table."""
    return spark.read.csv(path, sep="\t", schema=schema.spark_schema())
