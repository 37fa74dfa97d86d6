#!/bin/bash
# Clean-venv install proof (round-4 VERDICT item 7): build the wheel,
# install it into a FRESH venv (system site-packages only for the heavy
# preinstalled deps — jax/numpy/matplotlib; the wheel itself installs
# with --no-deps --no-index so nothing is fetched), and run the step01
# analytic gate (exit 0/1) through the installed console script.
#
# Usage: bash dev/check_install.sh        (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

TMP=$(mktemp -d /tmp/pelvistim_install_check.XXXXXX)
trap 'rm -rf "$TMP"' EXIT

echo "== building wheel =="
python -m pip wheel . --no-deps --no-build-isolation -w "$TMP/wheels" -q
WHEEL=$(ls "$TMP"/wheels/*.whl)
echo "   $WHEEL"

echo "== wheel contents sanity (native lib + bundled params) =="
python - "$WHEEL" <<'EOF'
import sys, zipfile
names = zipfile.ZipFile(sys.argv[1]).namelist()
assert any(n.endswith("_native.so") for n in names), \
    "wheel missing _native.so (run `make -C csrc` first)"
assert any("data/" in n and n.endswith(".yaml") for n in names), \
    "wheel missing bundled params yamls"
print(f"   {len(names)} files, _native.so + data/*.yaml present")
EOF

echo "== fresh venv + offline install =="
# The ambient python may itself be a venv (e.g. /opt/venv), in which
# case --system-site-packages would resolve to the WRONG base; instead
# expose the parent env's site-packages (jax/numpy/matplotlib) via a
# .pth file — the wheel itself still installs offline with --no-deps.
python -m venv "$TMP/venv"
PARENT_SP=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
VENV_SP=$("$TMP/venv/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
echo "$PARENT_SP" > "$VENV_SP/_parent_deps.pth"
"$TMP/venv/bin/pip" install --no-deps --no-index -q "$WHEEL"

echo "== console script: step01 analytic gates (exit code gated) =="
cd "$TMP"   # away from the repo: imports must come from the wheel
"$TMP/venv/bin/python" - <<'EOF'
import pelvistim_fem_tpu, pathlib
p = pathlib.Path(pelvistim_fem_tpu.__file__)
assert "venv" in str(p), f"imported from {p}, not the venv install"
from pelvistim_fem_tpu import native
assert native.available(), "installed wheel did not carry _native.so"
print(f"   import from {p.parent}, native kernels loaded")
EOF
"$TMP/venv/bin/pelvistim-step01"
echo "CLEAN-VENV INSTALL CHECK: PASS"
