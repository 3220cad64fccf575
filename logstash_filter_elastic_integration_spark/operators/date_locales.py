"""Locale banks for the date / date_index_name processors.

ES DateProcessor accepts a ``locale`` option (templated, default ENGLISH)
and binds java.time month/day-of-week *names* to that locale when the
format carries text fields (MMM/MMMM/EEE/EEEE).  Reference:
org.elasticsearch.ingest.common.DateProcessor (locale resolved per
document, passed to DateFormat.Java -> DateTimeFormatter.withLocale).

Spark's to_timestamp parses names with the JVM default (English) locale
and exposes no per-expression locale, so the Spark-first lowering is:
textually normalize localized month/day names to their English
equivalents with a chain of JVM-side ``regexp_replace`` (pure Column, no
UDF, stays inside whole-stage codegen), then parse with the English
formatter.  Name data below is transcribed from public Unicode CLDR
(the same source java.time uses), "format" context, with the
"standalone" variants added where they differ (ru nominative months).

Only name tokens are rewritten; numeric fields pass through untouched,
so applying the normalizer to a purely-numeric date string is a no-op.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_EN_MONTHS = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
_EN_MONTHS_AB = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                 "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_EN_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]
_EN_DAYS_AB = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]

# locale -> dict of CLDR name lists (months/months_ab: Jan..Dec,
# days/days_ab: Mon..Sun).  `months_alt` holds standalone/nominative
# variants that differ from the format context.
_BANK = {
    "de": {
        "months": ["Januar", "Februar", "März", "April", "Mai", "Juni",
                   "Juli", "August", "September", "Oktober", "November",
                   "Dezember"],
        "months_ab": ["Jan.", "Feb.", "März", "Apr.", "Mai", "Juni",
                      "Juli", "Aug.", "Sep.", "Okt.", "Nov.", "Dez."],
        "days": ["Montag", "Dienstag", "Mittwoch", "Donnerstag",
                 "Freitag", "Samstag", "Sonntag"],
        "days_ab": ["Mo.", "Di.", "Mi.", "Do.", "Fr.", "Sa.", "So."],
    },
    "fr": {
        "months": ["janvier", "février", "mars", "avril", "mai", "juin",
                   "juillet", "août", "septembre", "octobre", "novembre",
                   "décembre"],
        "months_ab": ["janv.", "févr.", "mars", "avr.", "mai", "juin",
                      "juil.", "août", "sept.", "oct.", "nov.", "déc."],
        "days": ["lundi", "mardi", "mercredi", "jeudi", "vendredi",
                 "samedi", "dimanche"],
        "days_ab": ["lun.", "mar.", "mer.", "jeu.", "ven.", "sam.",
                    "dim."],
    },
    "es": {
        "months": ["enero", "febrero", "marzo", "abril", "mayo", "junio",
                   "julio", "agosto", "septiembre", "octubre",
                   "noviembre", "diciembre"],
        "months_ab": ["ene.", "feb.", "mar.", "abr.", "may.", "jun.",
                      "jul.", "ago.", "sept.", "oct.", "nov.", "dic."],
        "days": ["lunes", "martes", "miércoles", "jueves", "viernes",
                 "sábado", "domingo"],
        "days_ab": ["lun.", "mar.", "mié.", "jue.", "vie.", "sáb.",
                    "dom."],
    },
    "it": {
        "months": ["gennaio", "febbraio", "marzo", "aprile", "maggio",
                   "giugno", "luglio", "agosto", "settembre", "ottobre",
                   "novembre", "dicembre"],
        "months_ab": ["gen", "feb", "mar", "apr", "mag", "giu",
                      "lug", "ago", "set", "ott", "nov", "dic"],
        "days": ["lunedì", "martedì", "mercoledì", "giovedì", "venerdì",
                 "sabato", "domenica"],
        "days_ab": ["lun", "mar", "mer", "gio", "ven", "sab", "dom"],
    },
    "pt": {
        "months": ["janeiro", "fevereiro", "março", "abril", "maio",
                   "junho", "julho", "agosto", "setembro", "outubro",
                   "novembro", "dezembro"],
        "months_ab": ["jan.", "fev.", "mar.", "abr.", "mai.", "jun.",
                      "jul.", "ago.", "set.", "out.", "nov.", "dez."],
        "days": ["segunda-feira", "terça-feira", "quarta-feira",
                 "quinta-feira", "sexta-feira", "sábado", "domingo"],
        "days_ab": ["seg.", "ter.", "qua.", "qui.", "sex.", "sáb.",
                    "dom."],
    },
    "nl": {
        "months": ["januari", "februari", "maart", "april", "mei",
                   "juni", "juli", "augustus", "september", "oktober",
                   "november", "december"],
        "months_ab": ["jan.", "feb.", "mrt.", "apr.", "mei", "jun.",
                      "jul.", "aug.", "sep.", "okt.", "nov.", "dec."],
        "days": ["maandag", "dinsdag", "woensdag", "donderdag",
                 "vrijdag", "zaterdag", "zondag"],
        "days_ab": ["ma", "di", "wo", "do", "vr", "za", "zo"],
    },
    "ru": {
        # format context is genitive ("5 января"); standalone nominative
        # added via months_alt so both shapes parse.
        "months": ["января", "февраля", "марта", "апреля", "мая",
                   "июня", "июля", "августа", "сентября", "октября",
                   "ноября", "декабря"],
        "months_alt": ["январь", "февраль", "март", "апрель", "май",
                       "июнь", "июль", "август", "сентябрь", "октябрь",
                       "ноябрь", "декабрь"],
        "months_ab": ["янв.", "февр.", "мар.", "апр.", "мая", "июн.",
                      "июл.", "авг.", "сент.", "окт.", "нояб.", "дек."],
        "days": ["понедельник", "вторник", "среда", "четверг",
                 "пятница", "суббота", "воскресенье"],
        "days_ab": ["пн", "вт", "ср", "чт", "пт", "сб", "вс"],
    },
    "pl": {
        "months": ["stycznia", "lutego", "marca", "kwietnia", "maja",
                   "czerwca", "lipca", "sierpnia", "września",
                   "października", "listopada", "grudnia"],
        "months_alt": ["styczeń", "luty", "marzec", "kwiecień", "maj",
                       "czerwiec", "lipiec", "sierpień", "wrzesień",
                       "październik", "listopad", "grudzień"],
        "months_ab": ["sty", "lut", "mar", "kwi", "maj", "cze",
                      "lip", "sie", "wrz", "paź", "lis", "gru"],
        "days": ["poniedziałek", "wtorek", "środa", "czwartek",
                 "piątek", "sobota", "niedziela"],
        "days_ab": ["pon.", "wt.", "śr.", "czw.", "pt.", "sob.",
                    "niedz."],
    },
    "ja": {
        "months": ["1月", "2月", "3月", "4月", "5月", "6月", "7月",
                   "8月", "9月", "10月", "11月", "12月"],
        "months_ab": [],  # identical to full in CLDR ja
        "days": ["月曜日", "火曜日", "水曜日", "木曜日", "金曜日",
                 "土曜日", "日曜日"],
        "days_ab": [],  # single-kanji; too collision-prone to rewrite
    },
    "zh": {
        "months": ["一月", "二月", "三月", "四月", "五月", "六月",
                   "七月", "八月", "九月", "十月", "十一月", "十二月"],
        "months_ab": ["1月", "2月", "3月", "4月", "5月", "6月", "7月",
                      "8月", "9月", "10月", "11月", "12月"],
        "days": ["星期一", "星期二", "星期三", "星期四", "星期五",
                 "星期六", "星期日"],
        "days_ab": ["周一", "周二", "周三", "周四", "周五", "周六",
                    "周日"],
    },
}

_ENGLISH = ("", "en", "en_us", "en_gb", "english", "root")


def _norm_tag(loc: str) -> str:
    return str(loc).replace("-", "_").lower()


def supported(loc) -> bool:
    if loc is None:
        return True
    tag = _norm_tag(loc)
    return tag in _ENGLISH or tag.split("_")[0] in _BANK


def replacement_pairs(loc: str) -> list[tuple[str, str]]:
    """(localized, english) token pairs for `loc`, longest-first so a
    full name is never shadowed by its own abbreviation."""
    bank = _BANK[_norm_tag(loc).split("_")[0]]
    pairs: list[tuple[str, str]] = []
    for key, eng in (("months", _EN_MONTHS), ("months_alt", _EN_MONTHS),
                     ("months_ab", _EN_MONTHS_AB), ("days", _EN_DAYS),
                     ("days_ab", _EN_DAYS_AB)):
        for local, english in zip(bank.get(key, ()), eng):
            # identity pairs (it "mar" == "Mar") still claim the token
            # below so a later homograph (it day "mar"->"Tue") can't
            # hijack it — emit them as no-op sentinels, filter after
            pairs.append((local, english))
    # longest-first; dedupe keeps the first (month over day, full over
    # abbr) mapping for an ambiguous token
    seen = set()
    out = []
    for local, english in sorted(pairs, key=lambda p: -len(p[0])):
        k = local.lower()
        if k not in seen:
            seen.add(k)
            if local.lower() != english.lower():
                out.append((local, english))
    return out


def normalize_names(src: Column, loc) -> Column:
    """Rewrite `loc`-localized month/day names in `src` to English.

    Pure Column — a chain of case-insensitive (Unicode) regexp_replace
    on literal tokens, codegen-friendly, no shuffle, no Python on the
    executor path.  English/root locales return `src` unchanged.
    """
    if loc is None or _norm_tag(loc) in _ENGLISH:
        return src
    if not supported(loc):
        raise ValueError(
            f"date locale [{loc}] is not supported; supported locale "
            f"languages: en {' '.join(sorted(_BANK))}")
    out = src
    for local, english in replacement_pairs(loc):
        # Latin-letter lookarounds stop a short token from matching
        # inside English text an earlier replacement produced (nl "ma"
        # inside "March") while staying CJK/Cyrillic-neighbor friendly
        # ("2023年1月" — "年" is a letter but not Latin).
        pat = (r"(?iu)(?<!\p{IsLatin})" + re.escape(local)
               + r"(?!\p{IsLatin})")
        out = F.regexp_replace(out, pat, english)
    return out
