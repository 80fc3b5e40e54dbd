"""Pipeline stages (SURVEY.md §2.3/§2.4): stateless map_batches functions
and stateful actor-pool classes, all Arrow-batch in / Arrow-batch out."""
