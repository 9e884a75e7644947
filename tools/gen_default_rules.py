"""Generate dr_source_spark/kb/default_rules.py from the reference KB YAML.

yaml.safe_load resolves duplicate top-level keys last-wins, matching the
reference's effective behavior (dr_source/core/knowledge_base.py:77).
"""
import yaml, pprint, io

with open("/root/reference/dr_source/config/knowledge_base.yaml") as f:
    rules = yaml.safe_load(f)

buf = io.StringIO()
buf.write('"""Factory-default rule catalog (data, not code).\n\n')
buf.write("Effective rules of the reference knowledge base\n")
buf.write("(/root/reference/dr_source/config/knowledge_base.yaml, v0.170.0) after\n")
buf.write("YAML duplicate-top-level-key resolution (last block wins under\n")
buf.write("yaml.safe_load -- see reference core/knowledge_base.py:77). Regenerate\n")
buf.write("with tools/gen_default_rules.py against a reference checkout.\n")
buf.write('"""\n\n')
buf.write("DEFAULT_RULES = ")
buf.write(pprint.pformat(rules, width=100, sort_dicts=False))
buf.write("\n")
open("/root/repo/dr_source_spark/kb/default_rules.py", "w").write(buf.getvalue())
print("categories:", len(rules))
