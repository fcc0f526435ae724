"""Sources: file readers with DataX-style options, the synthetic stream
source, JDBC split planning, and split math utilities."""
