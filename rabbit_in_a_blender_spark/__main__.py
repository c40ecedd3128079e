"""``python -m rabbit_in_a_blender_spark`` → the riab-spark CLI."""

from .cli import main

raise SystemExit(main())
