"""End-to-end jobs: index build (snapshot-incremental, resumable) and
query runs."""
