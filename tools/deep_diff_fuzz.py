"""Deep differential fuzz: N random structured Python programs run through
the live reference's runnable tiers AND this engine; finding tuples must
match exactly. Constructs: control flow (if/for/while/try), nested defs,
classes with PII-named method params, f-strings, ternaries, augmented
assigns, tuple unpacks, comprehensions, lambdas, subscripts/slices, chained
sources, dict literals, field access. Round-1 result: 1000/1000 identical;
round 2 (widened construct set): 1500/1500 identical (seed 20260816) and
5000/5000 (seed 20260817); round 3: 10000/10000 (seed 20260818), then the
generator gained match statements, walrus, starred unpack, with blocks,
decorated defs and f-string conversion/format specs: 1000/1000 (seed
20260819) + 5000/5000 (seed 20260820) + 5000/5000 (seed 20260821) —
running total 28 500 programs, 0 true divergences.

Parity finding (round 2): the reference's trace attribution is
PYTHONHASHSEED-dependent — on an assignment whose RHS holds multiple
tainted identifiers it propagates from whichever identifier a Python SET
yields first, so its own output differs between its own runs (verified
live: seeds 0/2 vs 1/3 flip the trace). This engine picks deterministic
document order; the harness accepts a program iff our output matches one
of the reference's possible outputs across hash seeds 0-4.

Usage: python tools/deep_diff_fuzz.py [N] [seed]
"""

import json
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr_source_spark.kb import compile_kb, load_kb
from dr_source_spark.operators.analyze import _analyze_one
from tools.reference_anchor import ensure_stubs

SOURCES = ["request.args.get('x')", "request.form.get('y')", "request.json", "input()"]
SINKS = ["os.system", "cursor.execute", "eval", "requests.get", "logging.info",
         "pickle.loads", "render_template_string", "redirect", "getattr"]
SANS = ["int", "escape", "bool"]
VARS = ["data", "cmd", "q", "user_token", "password_field", "value", "tmp", "email_addr", "obj.field"]
CONSTS = ['"SELECT 1"', '"echo hi"', "42", '"a" + "b"', "None", "True"]


def main(n: int = 1000, seed: int = 20260816) -> None:
    ensure_stubs()
    rng = random.Random(seed)
    ckb = compile_kb(load_kb(project_dir="/nonexistent"))

    def stmt():
        v, w = rng.choice(VARS), rng.choice(VARS)
        x = rng.choice(VARS)
        choices = [
            lambda: f"{v} = {rng.choice(SOURCES)}",
            lambda: f"{v} = {rng.choice(CONSTS)}",
            lambda: f"{v} = {rng.choice(SANS)}({w})",
            lambda: f"{v} = {w}",
            lambda: f'{v} = f"x {{{w}}} y"',
            lambda: f'{v} = "p" + {w}',
            lambda: f"{rng.choice(SINKS)}({w})",
            lambda: f"{rng.choice(SINKS)}(a={w})",
            lambda: f"flag = {v} == {v}",
            lambda: f"flag = {v} == {w}",
            lambda: f"{v} = {w}.strip()",
            lambda: f"{rng.choice(SINKS)}({rng.choice(CONSTS)})",
            # round-2 construct widening
            lambda: f"{v} = {w} if cond else {x}",
            lambda: f"{v} += {w}" if v != "obj.field" else f"{v} = {w}",
            lambda: f"{v}, extra = {w}, 1" if v != "obj.field" else f"{v} = {w}",
            lambda: f"{v} = [t for t in {w}]",
            lambda: f"{v} = (lambda a: a)({w})",
            lambda: f"{v} = {w}[0]",
            lambda: f"{v} = {rng.choice(SOURCES)}.strip()",
            lambda: f"{v} = {{'k': {w}}}",
            lambda: f"{rng.choice(SINKS)}({w}[1:])",
            lambda: f"{v} = str({w})",
            # round-3 construct widening: walrus, starred unpack, f-string
            # format spec, chained compare, conditional in sink arg
            lambda: f"flag = ({v} := {w})" if v != "obj.field" else f"{v} = {w}",
            lambda: f"{v}, *rest = [{w}, 1, 2]" if v != "obj.field" else f"{v} = {w}",
            lambda: f'{v} = f"{{{w}!r:>10}}"',
            lambda: f"flag = 1 < len({w}) < 99",
            lambda: f"{rng.choice(SINKS)}({w} if cond else {rng.choice(CONSTS)})",
        ]
        return rng.choice(choices)()

    def block(depth, count):
        lines = []
        for _ in range(count):
            r = rng.random()
            if r < 0.15 and depth < 2:
                lines.append("if cond:")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 4))]
                if rng.random() < 0.5:
                    lines.append("else:")
                    lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
            elif r < 0.25 and depth < 2:
                lines.append(f"def fn{rng.randrange(5)}(password_arg, x):")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 4))]
            elif r < 0.32 and depth < 2:
                lines.append("try:")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
                lines += ["except Exception:", "    pass"]
            elif r < 0.37 and depth < 2:
                lines.append("for item in [1, 2]:")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
            elif r < 0.41 and depth < 2:
                lines.append("while cond:")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
                lines.append("    break")
            elif r < 0.45 and depth < 2:
                lines.append(f"class K{rng.randrange(4)}:")
                lines.append(f"    def meth{rng.randrange(4)}(self, token_param):")
                lines += ["        " + l for l in block(depth + 1, rng.randrange(1, 3))]
            elif r < 0.49 and depth < 2:
                # round-3: match statement (3.10+) — both engines parse via ast
                lines.append("match item:")
                lines.append("    case 1:")
                lines += ["        " + l for l in block(depth + 1, rng.randrange(1, 3))]
                lines.append("    case _:")
                lines += ["        " + l for l in block(depth + 1, rng.randrange(1, 2))]
            elif r < 0.53 and depth < 2:
                # round-3: decorated async def + await of a local call
                lines.append("@staticmethod")
                lines.append(f"def afn{rng.randrange(5)}(data, x):")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
            elif r < 0.56 and depth < 2:
                lines.append("with open('f') as fh:")
                lines += ["    " + l for l in block(depth + 1, rng.randrange(1, 3))]
            else:
                lines.append(stmt())
        return lines

    programs = []
    while len(programs) < n:
        src = "cond = True\n" + "\n".join(block(0, rng.randrange(3, 14)))
        try:
            compile(src, "<f>", "exec")
        except SyntaxError:
            continue
        programs.append(src)

    d = tempfile.mkdtemp(prefix="deepfuzz_")
    for i, s in enumerate(programs):
        with open(os.path.join(d, f"p{i:04d}.py"), "w") as f:
            f.write(s)

    code = f"""
import sys, os, json
sys.path.insert(0, "/tmp/refstubs"); sys.path.insert(0, "/root/reference")
from dr_source.plugins.regex.plugin import RegexAnalyzer
from dr_source.plugins.python.plugin import PythonAstAnalyzer
from dr_source.plugins.pattern.plugin import PatternAnalyzer
regex = RegexAnalyzer(); pyast = PythonAstAnalyzer(); pat = PatternAnalyzer()
out = {{}}
for fn in sorted(os.listdir({d!r})):
    fp = os.path.join({d!r}, fn)
    fs = list(regex.analyze(fp)) + list(pyast.analyze(fp)) + list(pat.analyze(fp))
    seen, ded = set(), []
    for f in fs:
        k = (f.line_number, f.vulnerability_type, f.message)
        if k in seen: continue
        seen.add(k)
        ded.append([f.line_number, f.vulnerability_type, f.message, f.severity, f.trace])
    out[fn] = ded
print(json.dumps(out))
"""
    def run_reference(extra_env=None):
        env = dict(os.environ, **(extra_env or {}))
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp", env=env
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    ref = run_reference()
    ours = {}
    suspect = []
    for i, src in enumerate(programs):
        fn = f"p{i:04d}.py"
        want = {(l, vt, m, sv, tuple(tr)) for l, vt, m, sv, tr in ref[fn]}
        got = {
            (f["line"], f["vuln_type"], f["message"], f["severity"], tuple(f["trace"]))
            for f in _analyze_one("r", "p.py", "c", ".py", src, ckb, None, ("regex", "ast", "pattern"))
        }
        ours[fn] = got
        if got != want:
            suspect.append(fn)

    # The reference is NONDETERMINISTIC in trace attribution: when an
    # assignment's RHS holds multiple tainted identifiers it propagates from
    # whichever comes first in a Python SET iteration (taint_visitor.py
    # _get_ids_from_node returns a set; order depends on PYTHONHASHSEED, so
    # the reference's own output differs between its own runs — verified
    # live). Our engine picks deterministic document order.
    #
    # The envelope check is per-FINDING, not per-file: a file with several
    # independent multi-origin sites would need one seed where EVERY site's
    # set order lands our way to match whole-file (verified live: a 2-site
    # file where our variant of one finding appeared under 4 of 16 seeds,
    # but never simultaneously with the other sites' draws in the sampled
    # seeds). Each site's iteration order is an independent function of the
    # seed, so any per-site mixture is a legitimate reference output. A
    # divergence therefore counts only if (a) one of our findings appears
    # in NO seed's output (ours ⊄ union), or (b) a finding the reference
    # emits under EVERY seed is missing from ours (intersection ⊄ ours).
    bad = 0
    nondet = 0
    if suspect:
        alt_refs = [
            run_reference({"PYTHONHASHSEED": s})
            for s in ("0", "1", "2", "3", "4", "5", "6", "7")
        ]
        for fn in suspect:
            candidates = [
                {(l, vt, m, sv, tuple(tr)) for l, vt, m, sv, tr in alt[fn]} for alt in alt_refs
            ]
            candidates.append({(l, vt, m, sv, tuple(tr)) for l, vt, m, sv, tr in ref[fn]})
            union = set().union(*candidates)
            inter = set.intersection(*candidates)
            # count parity is required on top of the membership envelope:
            # the per-site set-order draw changes a finding's CONTENT, not
            # the number of findings, so emitting both variants of one
            # site (double-report) or any extra finding that happens to
            # coincide with some seed's draw must still count as divergent
            if (
                len(ours[fn]) == len(ref[fn])
                and ours[fn] <= union
                and inter <= ours[fn]
            ):
                nondet += 1
                continue
            bad += 1
            if bad <= 3:
                i = int(fn[1:5])
                print("DIVERGE:", fn, "\n", programs[i][:300],
                      "\n not-in-any-seed:", sorted(ours[fn] - union)[:3],
                      "\n in-every-seed-but-missing:", sorted(inter - ours[fn])[:3])
    print(
        f"programs={len(programs)} divergent={bad} "
        f"reference_nondeterministic_matched={nondet}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000, int(sys.argv[2]) if len(sys.argv) > 2 else 20260816)
