"""Logical-plan layer: MLlib Pipeline integration (the BASELINE.json approach
— 'MLlib pipelines with custom transformers') and plan-inspection utilities
used by the performance regression tests."""
