#!/bin/bash
# Leak scan: verify nothing proprietary/internal leaked into the library.
# Scans every tracked source/doc file for markers of non-public systems:
# internal-looking hosts/buckets/URLs, secret-ish env vars, and imports
# outside the allowed public namespaces (spark/scala/java + this repo).
# Emits JSON with provenance fields (timestamp, git rev, files_scanned)
# so a clean result is verifiably fresh — round-3 advice item.
set -u
cd /root/repo

TS=$(date -u +%Y-%m-%dT%H:%M:%SZ)
REV=$(git rev-parse --short HEAD 2>/dev/null || echo "none")
FILES=$(git ls-files 'src/**' '*.md' '*.scala' 'build.sbt' 2>/dev/null)
N=$(echo "$FILES" | wc -l)

HITS=""
add_hits() { # $1 = label, $2 = pattern (ERE)
  local out
  out=$(echo "$FILES" | xargs grep -nE "$2" 2>/dev/null \
    | grep -vE 'leakcheck|LEAKCHECK' || true)
  if [ -n "$out" ]; then
    while IFS= read -r line; do
      f=$(echo "$line" | cut -d: -f1); ln=$(echo "$line" | cut -d: -f2)
      HITS="$HITS{\"rule\":\"$1\",\"file\":\"$f\",\"line\":$ln},"
    done <<< "$out"
  fi
}

# internal-looking endpoints / buckets / credentials
add_hits "internal-host" '[a-z0-9-]+\.(corp|internal|intranet)\.[a-z]+'
add_hits "bucket-uri" '(s3|gs|abfss)://[a-z0-9._-]+'
add_hits "secret-env" '(AWS_SECRET|API_KEY|TOKEN=|PASSWORD=)'
# non-public package roots in Scala imports (allow org.apache, org.scalatest,
# org.scalacheck, scala, java, graft)
PRIV=$(echo "$FILES" | grep '\.scala$' | xargs grep -nE '^import ' 2>/dev/null \
  | grep -vE 'import (org\.apache|org\.scalatest|org\.scalacheck|scala|java|graft)[.]' || true)
if [ -n "$PRIV" ]; then
  while IFS= read -r line; do
    f=$(echo "$line" | cut -d: -f1); ln=$(echo "$line" | cut -d: -f2)
    HITS="$HITS{\"rule\":\"non-public-import\",\"file\":\"$f\",\"line\":$ln},"
  done <<< "$PRIV"
fi

HITS_JSON="[${HITS%,}]"
N_HITS=$(echo "$HITS_JSON" | grep -o '"rule"' | wc -l)

cat <<EOF
{"generated_at":"$TS","git_rev":"$REV","files_scanned":$N,"n_hits":$N_HITS,"hits":$HITS_JSON}
EOF
[ "$N_HITS" -eq 0 ]
