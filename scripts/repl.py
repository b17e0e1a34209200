"""Interactive console detector — the S6 surface, re-expressing the
reference console app (`app/App.kt:29-170`; the Swing GUI branch maps to
the driver/entry surface instead). Reads lines from stdin, prints the
detected language plus the top confidence values; ``:quit`` exits.

    python scripts/repl.py                 # all languages
    python scripts/repl.py de en fr        # restrict via ISO 639-1 codes
    echo "ein kurzer satz" | python scripts/repl.py de en
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from lingua_spark.builders import LanguageDetectorBuilder

    codes = [c for c in sys.argv[1:] if c != "-"]
    if codes:
        builder = LanguageDetectorBuilder.from_iso_codes_639_1(*codes)
    else:
        builder = LanguageDetectorBuilder.from_all_languages()
    det = builder.build()
    interactive = sys.stdin.isatty()
    if interactive:
        print(
            "lingua_spark console detector — type text, :quit to exit."
            f" ({len(builder.languages)} languages loaded)"
        )
    while True:
        if interactive:
            print("> ", end="", flush=True)
        line = sys.stdin.readline()
        if not line:
            break
        text = line.strip()
        if text == ":quit":
            break
        if not text:
            continue
        confs = det.confidence_values(text)
        lang = det.detect(text)
        top = ", ".join(f"{name} ({conf:.2%})" for name, conf in confs[:5])
        print(f"{lang}: {top if top else 'no evidence'}")
    if interactive:
        print("Bye! Ciao! Tschüss! Salut!")


if __name__ == "__main__":
    main()
