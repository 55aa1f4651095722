#!/usr/bin/env bash
# Package the library and spark-submit a pipeline command.
#
#   scripts/submit.sh [spark-submit args --] <cli subcommand + args>
#
# Args before a literal "--" go to spark-submit; the rest (or everything,
# when no "--" is given) go to wolf_quake_spark.cli.
#
# Examples:
#   scripts/submit.sh run --input /data/transcripts --out /data/out
#   scripts/submit.sh --master local[8] -- run --input /data/tr --out /data/out
#
# The --py-files zip is rebuilt on every invocation (cheap; the library is
# pure Python) so the shipped code always matches the working tree.
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/wqs-$(id -u).zip"

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" wolf_quake_spark -x '*__pycache__*')

# first "--" splits spark-submit args (before) from CLI args (after);
# without one, everything is CLI args
SUBMIT_ARGS=()
CLI_ARGS=()
seen_sep=false
for a in "$@"; do
  if [[ "$a" == "--" && "$seen_sep" == false ]]; then
    seen_sep=true
    SUBMIT_ARGS=("${CLI_ARGS[@]}")
    CLI_ARGS=()
    continue
  fi
  CLI_ARGS+=("$a")
done

# under spark-submit the driver JVM exists before SparkSession config runs,
# so session.py's spark.driver.memory is a no-op here — local[*] mode then
# runs every executor thread in a default-1g heap (observed OOM in the
# sessionization window sorts).  Pass it on the submit line, overridable via
# WQS_DRIVER_MEM or an explicit --driver-memory before "--".
has_driver_mem=false
for a in "${SUBMIT_ARGS[@]:-}"; do
  [[ "$a" == --driver-memory* ]] && has_driver_mem=true
done
if [[ "$has_driver_mem" == false ]]; then
  SUBMIT_ARGS+=(--driver-memory "${WQS_DRIVER_MEM:-8g}")
fi

exec spark-submit "${SUBMIT_ARGS[@]}" --py-files "$ZIP" \
  "$REPO/wolf_quake_spark/cli.py" "${CLI_ARGS[@]}"
