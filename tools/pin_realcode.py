"""(Re)generate tests/realcode/MANIFEST.json — sha256 pin per vendored file.

The real-code corpus is vendored verbatim from Apache-2.0 / BSD / MIT
sources already present in the build image (provenance in
tests/realcode/README.md). tests/test_realcode.py refuses to run against
files whose hashes drift from this manifest, so the parse-fidelity gates
always measure the same bytes.
"""

import hashlib
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "realcode")


def main() -> None:
    manifest = {}
    for dirpath, _dirs, files in os.walk(ROOT):
        # Tool/editor droppings (e.g. a stray .pytest_cache from running
        # pytest inside the corpus dir) are not corpus files; pinning them
        # breaks fresh checkouts where gitignored caches don't exist.
        _dirs[:] = [d for d in _dirs if not d.startswith(".")]
        for fn in sorted(files):
            if fn in ("MANIFEST.json", "README.md") or fn.startswith("."):
                continue
            fp = os.path.join(dirpath, fn)
            rel = os.path.relpath(fp, ROOT)
            with open(fp, "rb") as f:
                manifest[rel] = hashlib.sha256(f.read()).hexdigest()
    out = os.path.join(ROOT, "MANIFEST.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"pinned {len(manifest)} files -> {out}")


if __name__ == "__main__":
    main()
