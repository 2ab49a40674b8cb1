"""Column-expression libraries (all JVM-side, whole-stage-codegen friendly)."""
