#!/bin/bash
# Fast pre-commit smoke gate: every registered query must run at sf0.001
# and return rows (SimSpec), and the registry must stay in sync with
# SURVEY.md / oracle declarations (DocSyncSpec).
#
# This exists because two consecutive rounds shipped a final commit that
# broke the suite: a new query that was oracle-green at sf0.01 returned
# an empty frame at sf0.001 and redded the smoke test. ~2 min vs the
# ~25 min full suite.
set -e
cd /root/repo
sbt -batch "testOnly graft.SimSpec graft.DocSyncSpec" 2>&1 | tail -20
