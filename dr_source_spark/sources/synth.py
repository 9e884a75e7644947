"""Deterministic synthetic code corpus for scale benchmarks.

Derives a source_files table from the driver's ``documents`` parquet (the
sanctioned input — no external or random data): each document row becomes a
source file whose content is a fixture-shaped template with identifiers
mutated by ``doc_id`` (seeded, reproducible), cycling across languages so
every detector tier is exercised. Repo assignment is heavy-tailed
(repo k owns ~2k+1 files) to exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Small template bank, one per language tier. `§N§` is the per-row mutation
# point; `§W§` takes a corpus word so content correlates with the input row.
_TEMPLATES = [
    (
        "java",
        "src/App§N§.java",
        """import javax.servlet.http.HttpServletRequest;
import java.sql.Statement;
public class App§N§ {
    public void handle§N§(HttpServletRequest request, Statement statement) throws Exception {
        String user§N§ = request.getParameter("§W§");
        String q§N§ = "SELECT * FROM §W§ WHERE id = '" + user§N§ + "'";
        statement.executeQuery(q§N§);
        String safe§N§ = "SELECT 1";
        statement.executeQuery(safe§N§);
    }
}
""",
    ),
    (
        "python",
        "src/app§N§.py",
        """import os
from flask import request

def handle§N§():
    cmd§N§ = request.args.get("§W§")
    os.system(cmd§N§)

def safe§N§():
    fixed = "echo §W§"
    os.system(fixed)
""",
    ),
    (
        "javascript",
        "src/app§N§.js",
        """const express = require('express');
const app = express();
app.get('/r§N§', (req, res) => {
    const p§N§ = req.query.§W§;
    eval(p§N§);
    res.send('ok');
});
""",
    ),
    (
        "php",
        "src/page§N§.php",
        """<?php
$id§N§ = $_GET['§W§'];
$q§N§ = "SELECT * FROM §W§ WHERE id = " . $id§N§;
mysqli_query($conn, $q§N§);
$safe§N§ = "static";
echo "hello";
?>
""",
    ),
    (
        "ruby",
        "src/ctl§N§.rb",
        """class Ctl§N§
  def index§N§
    v§N§ = params[:§W§]
    system("lookup #{v§N§}")
    safe§N§ = "ls"
    system(safe§N§)
  end
end
""",
    ),
    (
        "other",
        "conf/settings§N§.ini",
        """[app§N§]
password = "supersecretvalue§N§"
endpoint = "§W§"
DEBUG = True
""",
    ),
]


def synth_code_corpus(documents: DataFrame, commit: str = "bench", copies: int = 1) -> DataFrame:
    """documents(doc_id, text, ...) → source_files, ``copies`` files per
    document (doc_key = doc_id*copies + c keeps ids unique/deterministic)."""
    n_templates = len(_TEMPLATES)
    if copies > 1:
        documents = documents.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_copy")
        ).select((F.col("doc_id") * copies + F.col("_copy")).alias("doc_id"), "text")
    word = F.coalesce(F.element_at(F.split(F.col("text"), " "), 3), F.lit("field"))
    word = F.regexp_replace(word, r"[^A-Za-z0-9_]", "x")
    sid = F.col("doc_id").cast("string")

    branches = None
    for i, (_lang, path_tpl, content_tpl) in enumerate(_TEMPLATES):
        path_expr = F.lit(None)
        pre, _, post = path_tpl.partition("§N§")
        path_expr = F.concat(F.lit(pre), sid, F.lit(post))
        parts = []
        for seg in content_tpl.split("§N§"):
            subparts = seg.split("§W§")
            for j, sp in enumerate(subparts):
                parts.append(F.lit(sp))
                if j < len(subparts) - 1:
                    parts.append(word)
            parts.append(sid)
        parts = parts[:-1]
        content_expr = F.concat(*parts)
        cond = F.pmod(F.col("doc_id"), F.lit(n_templates)) == i
        branch = F.when(cond, F.struct(path_expr.alias("path"), content_expr.alias("content")))
        branches = branch if branches is None else branches.when(cond, F.struct(path_expr.alias("path"), content_expr.alias("content")))

    # heavy-tailed repos: repo k owns ~2k+1 files (k = floor(sqrt(doc_id)))
    repo = F.concat(F.lit("repo_"), F.floor(F.sqrt(F.col("doc_id"))).cast("string"))
    picked = documents.select(F.col("doc_id"), repo.alias("repo"), branches.alias("pc"))
    return picked.select(
        "repo",
        F.col("pc.path").alias("path"),
        F.lit(commit).alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.col("pc.content").alias("content"),
    )
