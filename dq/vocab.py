"""Fixed vocabularies for the deterministic synthetic corpus.

Single source of truth shared by:
- ``dq.synth`` (the distributed webpages generator, FIXTURES.md §1),
- ``dq.models`` (char-n-gram langid profiles + n-gram LM trained on the
  same material, so scoring is self-consistent and fully deterministic),
- ``dq.heuristics`` (the English stopword set used by the stopword-fraction
  rule).

Everything here is a hand-fixed literal — no RNG, no wall clock.
"""

from __future__ import annotations

# ---------------------------------------------------------------- English
EN_STOPWORDS: list[str] = [
    "the", "and", "of", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
    "have", "from", "or", "one", "had", "by", "word", "but", "not", "what",
    "all", "were", "we", "when", "your", "can", "said", "there", "use", "an",
]

EN_CONTENT: list[str] = [
    "system", "water", "market", "research", "language", "model", "network",
    "science", "energy", "people", "history", "village", "mountain", "river",
    "garden", "window", "engine", "journey", "signal", "pattern", "theory",
    "forest", "harbor", "island", "castle", "bridge", "station", "library",
    "museum", "factory", "weather", "climate", "animal", "planet", "galaxy",
    "number", "letter", "stream", "valley", "desert", "meadow", "harvest",
    "winter", "summer", "spring", "autumn", "morning", "evening", "travel",
    "music", "painting", "sculpture", "teacher", "student", "doctor",
    "farmer", "writer", "reader", "singer", "dancer", "builder", "machine",
    "computer", "keyboard", "screen", "memory", "storage", "process",
    "thread", "cluster", "server", "client", "packet", "router", "cable",
    "circuit", "battery", "sensor", "camera", "picture", "story", "novel",
    "poem", "chapter", "sentence", "paragraph", "article", "journal",
    "report", "result", "method", "sample", "measure", "distance", "volume",
    "surface", "border", "region", "nation", "country", "capital", "street",
    "avenue", "corner", "market", "trade", "price", "value", "profit",
    "account", "credit", "budget", "salary", "income", "growth", "decline",
]

# ----------------------------------------------------------------- French
FR_WORDS: list[str] = [
    "le", "la", "les", "et", "de", "des", "un", "une", "dans", "pour",
    "avec", "sur", "est", "sont", "mais", "plus", "tout", "comme", "bien",
    "sans", "ville", "pays", "monde", "temps", "histoire", "langue", "eau",
    "montagne", "riviere", "jardin", "fenetre", "voyage", "chemin", "foret",
    "hiver", "printemps", "automne", "matin", "soir", "musique", "peinture",
    "professeur", "etudiant", "medecin", "ecrivain", "lecteur", "machine",
    "ordinateur", "memoire", "processus", "reseau", "energie", "marche",
    "recherche", "science", "nombre", "lettre", "vallee", "desert",
    "recolte", "maison",
]

# ----------------------------------------------------------------- German
DE_WORDS: list[str] = [
    "der", "die", "das", "und", "von", "ein", "eine", "mit", "auf", "ist",
    "sind", "aber", "mehr", "alle", "wie", "ohne", "stadt", "land", "welt",
    "zeit", "geschichte", "sprache", "wasser", "berg", "fluss", "garten",
    "fenster", "reise", "weg", "wald", "winter", "sommer", "herbst",
    "morgen", "abend", "musik", "gemalde", "lehrer", "student", "arzt",
    "schriftsteller", "leser", "maschine", "rechner", "speicher", "prozess",
    "netzwerk", "energie", "markt", "forschung", "wissenschaft", "zahl",
    "brief", "tal", "wueste", "ernte", "haus", "strasse", "brucke",
    "bahnhof",
]

# ----------------------------------------------------------------- Arabic
AR_WORDS: list[str] = [
    "في", "من", "على", "إلى", "عن", "مع", "هذا", "هذه", "كان", "التي",
    "الذي", "ماء", "جبل", "نهر", "حديقة", "نافذة", "رحلة", "طريق", "غابة",
    "شتاء", "صيف", "خريف", "صباح", "مساء", "موسيقى", "لوحة", "معلم",
    "طالب", "طبيب", "كاتب", "قارئ", "آلة", "حاسوب", "ذاكرة", "شبكة",
    "طاقة", "سوق", "بحث", "علم", "رقم",
]

# ---------------------------------------------------- gibberish ("unk")
GIB_WORDS: list[str] = [
    "xqzt", "vrbk", "qqvn", "zzkr", "wxjf", "ptkk", "bzzv", "kqrx", "jjvw",
    "ttzq", "grrk", "mmxv", "qwwz", "xxtp", "zvrq", "kkjb", "ppzx", "vvqt",
    "rrkz", "bbxw", "qzqz", "xkxk", "zwzw", "tqtq", "vjvj", "krkr", "wpwp",
    "zxzx", "qbqb", "xtxt",
]

# -------------------------------------------------------- PII ingredients
PII_NAMES: list[str] = [
    "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
    "ivan", "judy",
]
PII_TLDS: list[str] = ["com", "org", "net"]

# Deliberately fake placeholder lexicon (sci-fi expletives) — the scrub
# semantics only need a *fixed* list, not real slurs.
TOXIC_LEXICON: list[str] = [
    "sithspit", "frakking", "smegging", "gorram", "felgercarb",
]
