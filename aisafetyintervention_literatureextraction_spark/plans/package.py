"""Build the ``--py-files`` artifact for spark-submit deployment.

    python -m aisafetyintervention_literatureextraction_spark.plans.package [out.zip]
    spark-submit --py-files kgspark.zip \
      -m aisafetyintervention_literatureextraction_spark.plans.pipeline ...

Zips the package source tree (no tests, no caches) so every executor
can import the operators; the pipeline driver itself is a module
entry point inside the same package.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str = "kgspark.zip") -> str:
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    pkg_name = os.path.basename(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_root))
                z.write(full, rel)
    return os.path.abspath(out_path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "kgspark.zip"
    print(build_zip(out))
