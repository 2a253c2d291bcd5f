#!/usr/bin/env bash
# Parse --name value command-line options into shell variables.
# Same contract as the Kaldi/espnet helper the reference recipes use
# (ref egs/*/shared/parse_options.sh): each `--opt-name value` pair sets
# shell variable `opt_name=value`; the variable must already exist.
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*)
      name=$(echo "$1" | sed 's/^--//' | tr '-' '_')
      if ! eval "[ -n \"\${$name+x}\" ]"; then
        echo "$0: unknown option $1" >&2
        exit 1
      fi
      eval "$name=\"$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
