"""North-rule ship clause: the pipeline runs via spark-submit --py-files.

Packages ontoemma_spark into a zip, copies the entry script into a
directory that does NOT contain the package, and spark-submits from
there — so every import must resolve from the --py-files zip, exactly
as it would on a real cluster where executors only get the archive.
(Reference ships as an installed package + run_ontoemma.py CLI; the
Spark-native equivalent is the zip + spark-submit pattern documented in
scripts/run_pipeline.py and README.md.)
"""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:  # pragma: no cover
        return None


def _build_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "ontoemma_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    zip_path = str(tmp_path / "ontoemma_spark.zip")
    _build_zip(zip_path)
    # entries must be package-relative so zipimport can resolve them
    with zipfile.ZipFile(zip_path) as zf:
        assert "ontoemma_spark/__init__.py" in zf.namelist()

    scripts = tmp_path / "scripts"
    scripts.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), scripts)

    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(scripts / "run_pipeline.py"),
            "--synthetic", "--out", out_dir,
        ],
        cwd=str(tmp_path),  # no ontoemma_spark importable from here but the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(metrics) == {"extract", "link", "canonicalize", "materialize"}
    assert metrics["extract"]["pages"] == 200
    assert metrics["extract"]["triples"] > 0
    assert metrics["materialize"]["edges"] == metrics["extract"]["triples"]

    # the checkpoint manifest the driver would resume from exists and
    # carries the per-partition lineage counters
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest["stages"]) == {"extract", "link", "canonicalize", "materialize"}
    parts = manifest["stages"]["materialize"]["partitions"]
    assert sum(parts.values()) == metrics["materialize"]["edges"]
