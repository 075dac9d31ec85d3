"""The north_rule's deployment clause, exercised for real: the crawler
runs via ``spark-submit --py-files webcrawler_spark.zip`` with the
package resolved ONLY from the zip (the subprocess runs from a temp
cwd with PYTHONPATH stripped, so the repo checkout is not importable).
"""

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_zip(zip_path: str) -> None:
    pkg = os.path.join(REPO, "webcrawler_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_crawl(spark, tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    # inputs written by the test session; the submitted job only reads
    from webcrawler_spark.sources.synthetic_web import build_pages, seeds_df

    pages_dir = str(tmp_path / "pages")
    build_pages(spark).write.parquet(pages_dir)
    seeds = [r.url for r in seeds_df(spark).orderBy("seed_order").collect()]
    (tmp_path / "seeds.txt").write_text("\n".join(seeds) + "\n")

    zip_path = str(tmp_path / "webcrawler_spark.zip")
    _package_zip(zip_path)
    # the driver file is shipped standalone; every `webcrawler_spark.*`
    # import inside it must come from the zip
    driver = str(tmp_path / "driver.py")
    shutil.copy(os.path.join(REPO, "webcrawler_spark", "main.py"), driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    catalog = tmp_path / "catalog"
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver,
            "--seeds", str(tmp_path / "seeds.txt"),
            "--pages", pages_dir,
            "--catalog", str(catalog),
            "--limit", "30",
            "--max-rounds", "1",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # interrupted below budget (2 rounds); snapshots committed
    assert "crawled " in out.stdout, out.stdout[-2000:]
    assert "crawled 30 pages" not in out.stdout
    assert catalog.is_dir() and any(catalog.iterdir())

    # resume leg: a fresh driver process restores the frontier, seen
    # set, and per-host budgets from the catalog snapshots (no --seeds)
    # and finishes the SAME crawl exactly on the budget
    out2 = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver,
            "--resume",
            "--pages", pages_dir,
            "--catalog", str(catalog),
            "--limit", "30",
            "--max-rounds", "8",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=420,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    # budget law across the interruption: lands exactly on the limit
    assert "crawled 30 pages" in out2.stdout, out2.stdout[-2000:]
