"""Pure functions: parse kernels (python twins for the UDF batch kernel) and
their JVM-side Column-expression equivalents for the relational layer."""
