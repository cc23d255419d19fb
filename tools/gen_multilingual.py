#!/usr/bin/env python3
"""Author fixtures/multilingual.jsonl — the round-14 Unicode-tokenizer
fixture (same discipline as the other gen_* scripts: fully literal,
deterministic, no randomness; the DuckDB oracle reads THIS file at the
same absolute path Spark does).

The stock /root/testdata documents table is ASCII-only (its zh/es/de
rows carry Latin text), so the multilingual behavior of the tokenizer,
dedup and quality families certifies against this corpus instead.

Content plan (doc_id, lang, text):
  1-4   zh: docs 1/2 are punctuation+digit variants of the same content
        (normalizeForDedupU must collapse them), 3 is an exact copy of
        1, 4 is distinct
  5-7   ja: 5/6 differ only in ASCII digits + terminal punct, 7 distinct
  8-10  ru: 8/9 are case+digit variants, 10 distinct
  11-12 el: 12 is 11.upper() — exercises the final-sigma fold (ς→σ) and
        accented-capital round trip
  13-14 ar, 15-16 hi (combining marks), 17-18 ko, 19 th
  20-22 de (ß), fr (accents+apostrophes), tr (İ/ı dotted-I fold)
  23-25 en ASCII control: 23/24 near-dup (final sentence differs in
        two words + an inflection: 'Deduplication keeps' vs 'Quality
        filters keep'; J(3-shingles) = 0.625), 25 distinct
  26    mixed-script spam (Latin/Cyrillic homoglyphs) for scriptProfile
  27-28 empty / whitespace-only (classify-every-input posture)
  29    zh/en code-switch
  30    rare-fold probe: U+A7C7, U+A7C9, U+A7F5, İ, word-final Σ
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "multilingual.jsonl")

ZH_A = ("机器学习是人工智能的一个分支，它研究计算机如何从数据中学习。"
        "深度学习在2012年取得了重大突破！神经网络模型的参数规模不断增长。")
ZH_B = ("机器学习是人工智能的一个分支。它研究计算机如何从数据中学习！"
        "深度学习在1998年取得了重大突破。神经网络模型的参数规模不断增长？")
EL_A = ("Η Ελλάδα είναι χώρα της Ευρώπης. Ο πολιτισμός της είναι αρχαίος. "
        "Η Αθήνα είναι η πρωτεύουσα.")

DOCS = [
    (1, "zh", ZH_A),
    (2, "zh", ZH_B),
    (3, "zh", ZH_A),
    (4, "zh", "北京是中国的首都，历史悠久。故宫和长城吸引了许多游客。传统文化与现代科技在这里交融。"),
    (5, "ja", "東京は日本の首都です。人口は約1400万人です。桜の季節には多くの観光客が訪れます。"),
    (6, "ja", "東京は日本の首都です！人口は約9900万人です。桜の季節には多くの観光客が訪れます！"),
    (7, "ja", "京都には古い寺院がたくさんあります。金閣寺は有名な観光名所です。"),
    (8, "ru", "Москва — столица России. Город основан в 1147 году. Красная площадь находится в центре города."),
    (9, "ru", "МОСКВА — СТОЛИЦА РОССИИ. Город основан в 2020 году. красная площадь находится в центре города."),
    (10, "ru", "Байкал — самое глубокое озеро в мире. Его глубина достигает 1642 метров."),
    (11, "el", EL_A),
    (12, "el", EL_A.upper()),
    (13, "ar", "القاهرة هي عاصمة مصر. يمر نهر النيل عبر المدينة. تشتهر مصر بالأهرامات القديمة."),
    (14, "ar", "اللغة العربية تكتب من اليمين الى اليسار. وهي من اكثر اللغات انتشارا في العالم."),
    (15, "hi", "भारत एक विशाल देश है। दिल्ली इसकी राजधानी है। यहाँ अनेक भाषाएँ बोली जाती हैं।"),
    (16, "hi", "गंगा नदी हिमालय से निकलती है। यह भारत की सबसे लंबी नदी है।"),
    (17, "ko", "서울은 한국의 수도입니다. 한강이 도시를 가로질러 흐릅니다. 김치는 한국의 전통 음식입니다."),
    (18, "ko", "부산은 한국 남부의 항구 도시입니다. 해운대 해수욕장이 유명합니다."),
    (19, "th", "กรุงเทพมหานครเป็นเมืองหลวงของประเทศไทย มีวัดสวยงามมากมาย อาหารไทยมีชื่อเสียงไปทั่วโลก"),
    (20, "de", "Die Straße nach München ist lang. Im Frühjahr blühen die Bäume. Fußball ist der beliebteste Sport."),
    (21, "fr", "L'été à Paris est très agréable. Les cafés près de la Seine sont célèbres. Beaucoup d'étudiants visitent les musées."),
    (22, "tr", "İstanbul Türkiye'nin en büyük şehridir. Boğaziçi köprüsü iki kıtayı birleştirir. Şehirde ışıklar gece boyunca parlar."),
    (23, "en", "The quick brown fox jumps over the lazy dog. Machine learning systems need large clean corpora. Deduplication keeps training data healthy."),
    (24, "en", "The quick brown fox jumps over the lazy dog. Machine learning systems need large clean corpora. Quality filters keep training data healthy."),
    (25, "en", "Completely different english content about databases. Query engines optimize joins and scans. Columnar formats compress well."),
    # six Cyrillic homoglyphs per repeat (Б, е, а, н, с, о) over 27
    # letters → second-script share 222222 ppm, STRICTLY over the
    # 200000 mixed bound
    (26, "xx", "Бuy chеap wаtches нere сlick nоw Бuy chеap wаtches нere сlick nоw"),
    (27, "xx", ""),
    (28, "xx", "   \t  "),
    (29, "zh", "我们使用 Apache Spark 处理 100 TB 的数据。它的 DataFrame API 非常好用。"),
    (30, "xx", chr(0xA7C7) + "ream " + chr(0xA7F5) + "ase "
        + chr(0xA7C9) + "ab İstanbul ΟΔΟΣ"),
]


def main() -> None:
    ids = [d[0] for d in DOCS]
    assert ids == list(range(1, 31)), "doc_ids must be 1..30 contiguous"
    # fold-probe doc must actually carry the divergent codepoints
    assert all(c in DOCS[29][2] for c in (chr(0xA7C7), chr(0xA7C9),
                                          chr(0xA7F5), "İ", "Σ"))
    # the el pair must differ only by case (the upper() round trip)
    assert DOCS[10][2].upper() == DOCS[11][2]
    # exact-dup pair really is exact
    assert DOCS[0][2] == DOCS[2][2]
    with open(OUT, "w", encoding="utf-8") as f:
        for doc_id, lang, text in DOCS:
            f.write(json.dumps(
                {"doc_id": doc_id, "lang": lang, "text": text},
                ensure_ascii=False) + "\n")
    print(f"wrote {len(DOCS)} docs -> {OUT}")


if __name__ == "__main__":
    main()
