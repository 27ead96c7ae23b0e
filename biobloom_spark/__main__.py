"""``python -m biobloom_spark`` — the reference-binary twin CLIs."""

from .cli import main

raise SystemExit(main())
