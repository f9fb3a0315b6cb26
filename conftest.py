# Repo-root conftest: makes the in-repo package importable without install.
