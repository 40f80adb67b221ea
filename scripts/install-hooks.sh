#!/bin/bash
# Install the repo's git hooks (pre-commit smoke gate).
set -e
cd "$(dirname "$0")/.."
cp scripts/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit scripts/pre-commit scripts/smoke.sh
echo "[install-hooks] pre-commit smoke gate installed"
