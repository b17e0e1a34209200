"""Detection core shared by the pure-Python oracle and the Spark engine."""
