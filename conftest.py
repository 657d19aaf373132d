# Repo-root conftest: makes `crawler_engine_spark` importable in tests
# without an install step (the sandbox forbids pip install).
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
