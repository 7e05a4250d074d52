"""Sources & sinks: synthetic pages generator, table IO, checkpointing."""
