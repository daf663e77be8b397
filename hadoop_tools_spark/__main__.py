"""``python -m hadoop_tools_spark`` → the hh-compatible CLI."""

from .cli import main

raise SystemExit(main())
