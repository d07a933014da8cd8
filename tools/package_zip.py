"""Build the --py-files package zip for spark-submit deployments."""

from __future__ import annotations

import os
import zipfile

PKG = "hmm_crf_ner_fromscratch_spark"


def build_package_zip(out_path: str = "/tmp/kgsparkle.zip") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(repo, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    print(build_package_zip())
