"""End-to-end pipeline compositions (SURVEY.md §3): the reference's
Airflow DAGs re-expressed as single-engine Spark jobs."""
