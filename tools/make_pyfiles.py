"""Zip the scrape_spark package for spark-submit --py-files."""

import os
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = "/tmp/scrape_spark.zip"
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(repo, "scrape_spark")
    for root, _, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
print(out)
