"""Pure kernels and Spark expression/UDF builders."""
