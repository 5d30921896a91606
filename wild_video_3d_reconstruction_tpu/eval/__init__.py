from . import harness, metrics
