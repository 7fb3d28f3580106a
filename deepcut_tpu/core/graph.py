"""Graph engine placeholder (filled in below)."""
class Net:  # pragma: no cover - replaced shortly
    pass
