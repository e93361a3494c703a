"""Column-expression helper functions (pure, JVM-side where possible)."""
