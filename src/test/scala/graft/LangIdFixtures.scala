package graft

/** Deterministic labeled training corpus for [[graft.ops.LangId]] —
  * THIRTY languages across scripts (Latin, Cyrillic, Greek, Arabic,
  * Hebrew, Devanagari, Bengali, Tamil, Thai, Hangul, Japanese,
  * Chinese), three original sentences each, ALL LOWERCASE where the
  * script has case (so the `lower()` normalization is a no-op in both
  * engines — ICU vs JVM case folding can never diverge) and NFC
  * precomposed throughout (code-point gram parity: Spark substr,
  * DuckDB substr, and the kernel all walk code points). Committed at
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
    "tr" -> "çocuklar okuldan sonra bahçede top oynuyor ve akşam eve yorgun dönüyorlar",
    "ru" -> "старый кот спит на подоконнике весь день пока солнце греет его спину",
    "ru" -> "мы вчера долго гуляли по парку и говорили о планах на лето",
    "ru" -> "дети играют во дворе после школы а бабушка готовит ужин на кухне",
    "uk" -> "старий будинок стоїть на пагорбі за лісом і в ньому давно ніхто не живе",
    "uk" -> "діти граються у дворі після школи а мати готує вечерю на кухні",
    "uk" -> "ми вчора довго гуляли берегом річки та розмовляли про подорож до моря",
    "bg" -> "старото куче спи цял ден под масата докато децата играят навън",
    "bg" -> "баба ми пече хляб всяка събота сутрин и цялата къща ухае прекрасно",
    "bg" -> "вчера ходихме на разходка край реката и говорихме за плановете си за лятото",
    "el" -> "το μικρό σπίτι βρίσκεται δίπλα στη θάλασσα και έχει κόκκινη στέγη",
    "el" -> "τα παιδιά παίζουν στην αυλή ενώ η γιαγιά ετοιμάζει το βραδινό στην κουζίνα",
    "el" -> "χθες περπατήσαμε πολλή ώρα στο πάρκο και μιλήσαμε για το καλοκαίρι",
    "ar" -> "يذهب الأولاد إلى المدرسة كل صباح ويعودون إلى البيت في المساء",
    "ar" -> "تطبخ الجدة طعاما لذيذا كل يوم جمعة وتجتمع العائلة حول المائدة",
    "ar" -> "مشينا أمس على شاطئ البحر وتحدثنا عن خططنا للصيف القادم",
    "fa" -> "کودکان بعد از مدرسه در حیاط بازی می کنند و مادر شام می پزد",
    "fa" -> "دیروز در کنار رودخانه قدم زدیم و درباره سفر تابستان صحبت کردیم",
    "fa" -> "پیرمرد هر صبح در پارک قدم می زند و به پرندگان نان می دهد",
    "he" -> "הילדים משחקים בחצר אחרי בית הספר והאמא מכינה ארוחת ערב במטבח",
    "he" -> "אתמול טיילנו ליד הנהר ודיברנו על התוכניות שלנו לקיץ",
    "he" -> "הסבתא אופה לחם בכל יום שישי וכל הבית מתמלא בריח נפלא",
    "hi" -> "बच्चे स्कूल के बाद आंगन में खेलते हैं और मां रसोई में खाना बनाती है",
    "hi" -> "कल हम नदी के किनारे देर तक घूमे और गर्मियों की योजना पर बात की",
    "hi" -> "दादी हर रविवार को मिठाई बनाती हैं और पूरा परिवार साथ खाता है",
    "bn" -> "ছেলেমেয়েরা বিকেলে উঠানে খেলা করে আর মা রান্নাঘরে রাতের খাবার তৈরি করেন",
    "bn" -> "গতকাল আমরা নদীর ধারে অনেকক্ষণ হাঁটলাম এবং গরমের ছুটির পরিকল্পনা নিয়ে কথা বললাম",
    "bn" -> "দাদি প্রতি শুক্রবার পিঠা বানান এবং সারা বাড়ি মিষ্টি গন্ধে ভরে যায়",
    "ta" -> "குழந்தைகள் பள்ளி முடிந்து முற்றத்தில் விளையாடுகிறார்கள் அம்மா சமையலறையில் உணவு செய்கிறார்",
    "ta" -> "நேற்று நாங்கள் ஆற்றங்கரையில் நீண்ட நேரம் நடந்து கோடை திட்டங்களைப் பற்றி பேசினோம்",
    "ta" -> "பாட்டி ஞாயிறு தோறும் இனிப்பு செய்கிறார் குடும்பம் ஒன்றாக அமர்ந்து சாப்பிடும்",
    "th" -> "เด็กๆเล่นอยู่ในสนามหลังเลิกเรียนส่วนแม่ทำอาหารเย็นอยู่ในครัว",
    "th" -> "เมื่อวานเราเดินเล่นริมแม่น้ำนานมากและคุยกันเรื่องแผนสำหรับฤดูร้อน",
    "th" -> "คุณยายทำขนมทุกวันอาทิตย์และทั้งบ้านก็หอมไปด้วยกลิ่นหวาน",
    "ko" -> "아이들은 학교가 끝나면 마당에서 놀고 어머니는 부엌에서 저녁을 준비한다",
    "ko" -> "어제 우리는 강가를 오래 걸으며 여름 계획에 대해 이야기했다",
    "ko" -> "할머니는 일요일마다 빵을 구우시고 온 집안에 좋은 냄새가 가득하다",
    "ja" -> "子供たちは学校が終わると庭で遊び母は台所で夕食を作っている",
    "ja" -> "昨日私たちは川沿いを長く歩いて夏の計画について話した",
    "ja" -> "祖母は日曜日ごとにパンを焼き家中が良い香りに包まれる",
    "zh" -> "孩子们放学后在院子里玩耍母亲在厨房里准备晚饭",
    "zh" -> "昨天我们沿着河边走了很久谈论夏天的计划",
    "zh" -> "奶奶每个星期天都做点心整个屋子都是香味",
    "vi" -> "bọn trẻ chơi ngoài sân sau giờ học còn mẹ nấu bữa tối trong bếp",
    "vi" -> "hôm qua chúng tôi đi dạo rất lâu bên bờ sông và nói về kế hoạch mùa hè",
    "vi" -> "bà làm bánh vào mỗi sáng chủ nhật và cả nhà thơm mùi bánh mới",
    "id" -> "anak anak bermain di halaman setelah pulang sekolah dan ibu memasak makan malam di dapur",
    "id" -> "kemarin kami berjalan lama di tepi sungai dan membicarakan rencana liburan musim panas",
    "id" -> "nenek membuat kue setiap hari minggu dan seluruh rumah harum baunya",
    "ro" -> "copiii se joacă în curte după școală iar mama pregătește cina în bucătărie",
    "ro" -> "ieri ne-am plimbat mult pe malul râului și am vorbit despre planurile de vară",
    "ro" -> "bunica coace pâine în fiecare duminică și toată casa miroase minunat",
    "cs" -> "děti si po škole hrají na dvoře a maminka vaří večeři v kuchyni",
    "cs" -> "včera jsme se dlouho procházeli podél řeky a mluvili o plánech na léto",
    "cs" -> "babička peče chleba každou sobotu ráno a celý dům krásně voní",
    "hu" -> "a gyerekek iskola után az udvaron játszanak és anya vacsorát főz a konyhában",
    "hu" -> "tegnap sokáig sétáltunk a folyó partján és a nyári terveinkről beszélgettünk",
    "hu" -> "a nagymama minden vasárnap kenyeret süt és az egész ház illatos lesz",
    "fi" -> "lapset leikkivät pihalla koulun jälkeen ja äiti valmistaa illallista keittiössä",
    "fi" -> "kävelimme eilen pitkään joen rannalla ja puhuimme kesän suunnitelmista",
    "fi" -> "isoäiti leipoo leipää joka sunnuntai ja koko talo tuoksuu ihanalta")

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
