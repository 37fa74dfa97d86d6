#!/usr/bin/env python3
"""Launcher for pelvistim_fem_tpu.apps.meshtool (see that module).

Keeps `python apps/meshtool.py ...` working from an uninstalled checkout;
the installed console script is the primary entry point."""
if __name__ == "__main__":
    try:
        from pelvistim_fem_tpu.apps.meshtool import main
    except ImportError:
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from pelvistim_fem_tpu.apps.meshtool import main
    import sys
    sys.exit(main())
