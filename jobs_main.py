"""Thin spark-submit driver script.

  spark-submit --py-files /tmp/jse.zip jobs_main.py build --input ... --output ...

Kept at the repo root so `--py-files` ships the package zip while this
file is the submitted script (see job_searchengine_project_spark/jobs.py).
"""

from job_searchengine_project_spark.jobs import main

if __name__ == "__main__":
    main()
