package graft

/** Deterministic labeled training corpus for [[graft.ops.LangId]] —
  * ten Latin-script languages, three original sentences each, ALL
  * LOWERCASE (so the `lower()` normalization is a no-op in both
  * engines — ICU vs JVM case folding can never diverge). Committed at
  * `fixtures/langid/train.jsonl`, byte-asserted against this
  * generator. Run `Test/runMain graft.GenLangIdFixtures <dir>`.
  */
object LangIdFixtures {

  val Sentences: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog while the children watch from the garden",
    "en" -> "she said that it would rain today so we should bring the umbrella with us to the station",
    "en" -> "after dinner they walked along the river and talked about their plans for the summer",
    "es" -> "el perro corre por el parque todas las mañanas antes de que salga el sol",
    "es" -> "mi hermana compró una casa nueva cerca de la playa el año pasado con su marido",
    "es" -> "los niños juegan en la calle mientras sus padres preparan la cena en la cocina",
    "de" -> "der alte mann sitzt jeden tag auf der bank im park und füttert die tauben",
    "de" -> "wir haben gestern einen langen brief an unsere großmutter in berlin geschrieben",
    "de" -> "das wetter ist heute sehr schön und die kinder spielen draußen im garten",
    "fr" -> "le chat dort sur le canapé pendant que la pluie tombe doucement sur la ville",
    "fr" -> "nous avons mangé du pain avec du fromage et du vin rouge dans un petit restaurant",
    "fr" -> "elle marche chaque matin le long de la rivière avant de commencer son travail",
    "it" -> "la nonna prepara la pasta fatta in casa ogni domenica per tutta la famiglia",
    "it" -> "il treno per roma parte alle otto e arriva nel pomeriggio alla stazione centrale",
    "it" -> "i bambini giocano nella piazza mentre i genitori bevono il caffè al bar",
    "pt" -> "o gato subiu no telhado da casa e não queria descer de jeito nenhum",
    "pt" -> "nós vamos à praia amanhã de manhã se o tempo estiver bom e sem chuva",
    "pt" -> "a minha mãe faz um bolo de chocolate delicioso todos os domingos à tarde",
    "nl" -> "de jongen fietst elke dag naar school langs het kanaal en over de oude brug",
    "nl" -> "wij hebben gisteren een mooie wandeling gemaakt door het bos achter ons huis",
    "nl" -> "het meisje leest een spannend boek in de tuin onder de grote appelboom",
    "sv" -> "den gamla katten sover hela dagen i fönstret där solen värmer som bäst",
    "sv" -> "vi åkte till stugan vid sjön i somras och badade varje morgon före frukost",
    "sv" -> "barnen leker i trädgården medan föräldrarna dricker kaffe på verandan",
    "pl" -> "stary dom stoi na wzgórzu za lasem i nikt w nim nie mieszka od wielu lat",
    "pl" -> "moja babcia piecze chleb w każdą sobotę rano i cały dom pachnie wspaniale",
    "pl" -> "dzieci wracają ze szkoły po południu i odrabiają lekcje przy stole w kuchni",
    "tr" -> "yaşlı adam her sabah parkta yürüyüş yapıyor ve kuşlara ekmek veriyor",
    "tr" -> "annem pazar günleri börek yapar ve bütün aile kahvaltıda bir araya gelir",
    "tr" -> "çocuklar okuldan sonra bahçede top oynuyor ve akşam eve yorgun dönüyorlar")

  /** The JSONL file body (no quotes/backslashes occur in the text, so
    * the rendering below IS valid JSON).
    */
  def trainJsonl: String =
    Sentences.map { case (lang, text) =>
      s"""{"lang": "$lang", "text": "$text"}"""
    }.mkString("", "\n", "\n")

  def all: Seq[(String, String)] = Seq("train.jsonl" -> trainJsonl)
}

object GenLangIdFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/langid")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    LangIdFixtures.all.foreach { case (name, text) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $dir/$name (${text.length} chars)")
    }
  }
}
