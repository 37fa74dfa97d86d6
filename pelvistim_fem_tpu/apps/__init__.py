"""Command-line applications (reference-parity runners + beyond-reference
workflows).  Each module exposes main(); console entry points are wired
in pyproject.toml, and thin launchers under the repo-root apps/ keep the
`python apps/run_*.py` invocation working from an uninstalled checkout."""
