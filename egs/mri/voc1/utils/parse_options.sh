#!/usr/bin/env bash
# Minimal kaldi-style option parser: turns "--foo-bar value" into foo_bar=value
# for variables that were pre-declared in the calling script.

while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*)
      name=$(echo "$1" | sed 's/^--//' | tr '-' '_')
      if eval '[ -z "${'"$name"'+x}" ]'; then
        echo "parse_options.sh: unknown option $1" >&2
        exit 1
      fi
      eval "${name}=\"$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
