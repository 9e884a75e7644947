"""Inter-file resolution via distributed joins — the fallback when the
symbol index exceeds any broadcast budget (SURVEY.md §2A A4 strategy (b)).

Instead of shipping one global dict to every executor, each file gets its
own (tiny) slice of the index attached as a map column:

  round 1: call-shaped identifiers per file  ⋈  index on name
  rounds 2..max_depth: identifiers inside the resolved def snippets
                       ⋈ index again (transitive closure to the same
                       depth-3 the reference's simulation recurses)

All joins are plain equi-joins on a short string key — shuffle-partitioned,
skew handled by AQE; nothing is collected to the driver. The detector stage
then reads the per-row map instead of a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# doubled backslashes: this literal is embedded inside a SQL expr string
CALL_NAME_RE = r"([A-Za-z_$][A-Za-z0-9_$]*)\\s*\\("

_DEF_STRUCT = ["name", "def_path", "lang", "def_source", "def_line", "params"]


def _called(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        "repo",
        "path",
        F.explode(
            F.array_distinct(F.expr(f"regexp_extract_all({text_col}, '{CALL_NAME_RE}', 1)"))
        ).alias("name"),
    )


def attach_called_defs(files: DataFrame, index_df: DataFrame, max_depth: int = 3) -> DataFrame:
    """files(repo, path, …, content) → same rows + ``called_defs``
    map<string, struct<def_path, lang, def_source, def_line, params>> holding
    every def reachable from the file within ``max_depth`` call hops."""
    idx = index_df.select(
        "name",
        F.col("path").alias("def_path"),
        "lang",
        "def_source",
        "def_line",
        "params",
    )

    frontier = _called(files, "content").join(idx, "name")
    all_defs = frontier
    for _hop in range(1, max_depth):
        names = _called(
            frontier.select("repo", "path", F.col("def_source").alias("_src")), "_src"
        )
        frontier = names.join(idx, "name")
        all_defs = all_defs.unionByName(frontier)

    per_file = (
        all_defs.dropDuplicates(["repo", "path", "name"])
        .groupBy("repo", "path")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("name"),
                        F.struct(
                            F.col("def_path").alias("path"),
                            F.col("lang"),
                            F.col("def_source"),
                            F.col("def_line"),
                            F.col("params"),
                        ),
                    )
                )
            ).alias("called_defs")
        )
    )
    return files.join(per_file, ["repo", "path"], "left")
