from .model import (
    C2IOC,
    FilenameIOC,
    HashIOC,
    SignatureSet,
    YaraRule,
    YaraString,
)
from .parsers import (
    hash_type_of,
    load_signature_set,
    parse_c2_iocs,
    parse_filename_iocs,
    parse_hash_iocs,
    parse_yara_rules,
)

__all__ = [
    "C2IOC",
    "FilenameIOC",
    "HashIOC",
    "SignatureSet",
    "YaraRule",
    "YaraString",
    "hash_type_of",
    "load_signature_set",
    "parse_c2_iocs",
    "parse_filename_iocs",
    "parse_hash_iocs",
    "parse_yara_rules",
]
