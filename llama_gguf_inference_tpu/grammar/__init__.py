"""Grammar-constrained decoding (llama-server ``response_format`` /
``grammar`` parity).

The reference proxies request bodies verbatim to llama-server
(reference ``scripts/gateway.py:807``), whose binary honors OpenAI
``response_format`` (json_object / json_schema) and GBNF ``grammar``
fields.  This package is the TPU-native equivalent:

- :mod:`gbnf` parses llama.cpp's GBNF grammar format into a compact
  rule graph;
- :mod:`json_schema` converts JSON Schema (the useful subset llama.cpp's
  ``json_schema_to_grammar`` covers) to GBNF;
- :mod:`matcher` runs the grammar as an incremental pushdown automaton
  over the *token* stream: a vocab byte-trie walk computes the set of
  valid next tokens per automaton state (cached per state — JSON
  grammars revisit a small number of states), which the engine applies
  as a device-side ``-inf`` logit mask before sampling
  (``runtime.sampler.SampleState.bias``).

Division of labor is deliberately TPU-shaped: the automaton (irregular,
data-dependent, tiny) steps on host; the vocab-sized masking and the
actual sampling stay inside the jitted decode graph.
"""

from .gbnf import Grammar, parse_gbnf
from .json_schema import JSON_GBNF, json_schema_to_gbnf
from .matcher import GrammarMatcher, TokenTrie

__all__ = ["Grammar", "parse_gbnf", "json_schema_to_gbnf", "JSON_GBNF",
           "GrammarMatcher", "TokenTrie"]
