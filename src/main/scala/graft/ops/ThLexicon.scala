package graft.ops

/** Committed Thai frequency lexicon — the word table behind the
  * `thai-dict` FMM grain ([[FmmLexicon]]; round 15). Thai is the
  * unsegmented script where the codepoint fallback is WORST as an IR:
  * Thai words average 3-5 codepoints (combining vowels and tone marks
  * are separate codepoints), so character unigrams carry even less
  * word signal than Han characters do. The word list is a
  * knowledge-bounded rendering of the high-frequency core shared by
  * public Thai frequency lists (the NECTEC LEXiTRON headword list,
  * Thai National Corpus bands — words re-listed from knowledge, not
  * copied files); like [[ZhLexicon]] / [[PublicSuffixes]], the
  * MECHANISM is sized for a full production lexicon (extending is
  * appending lines here and both dialects pick them up).
  *
  * `maxLen` 9 (vs zh's 4): Thai orthography spells common words long
  * (โรงพยาบาล "hospital" = 9 codepoints), so the FMM window — and the
  * oracle's CASE-ladder depth — must reach further. Worst case that
  * costs 8 hash probes per dominated position under this grain only.
  */
object ThLexicon extends FmmLexicon {

  val maxLen: Int = 9

  private val core: Seq[String] = Seq(
    // pronouns / people
    "ผม", "ฉัน", "คุณ", "เขา", "เรา", "มัน", "พวกเขา", "พวกเรา",
    "คน", "เด็ก", "ผู้หญิง", "ผู้ชาย", "เพื่อน", "ครอบครัว",
    "พ่อ", "แม่", "พี่", "น้อง", "ครู", "นักเรียน", "หมอ", "พยาบาล",
    "ตำรวจ", "ทหาร",
    // places / institutions
    "ประเทศ", "ไทย", "ประเทศไทย", "กรุงเทพ", "เชียงใหม่", "ภูเก็ต",
    "เมือง", "บ้าน", "โรงเรียน", "โรงพยาบาล", "ธนาคาร", "ตลาด",
    "ร้าน", "ทะเล", "ภูเขา", "แม่น้ำ",
    // language / abstractions
    "ภาษา", "ภาษาไทย", "หนังสือ", "เวลา", "นาฬิกา", "เงิน", "ใจ",
    // time / weather
    "วันนี้", "พรุ่งนี้", "เมื่อวาน", "อาทิตย์", "เดือน", "ปี",
    "ร้อน", "หนาว", "ฝน", "อากาศ",
    // nature / animals / food
    "ต้นไม้", "ดอกไม้", "สัตว์", "หมา", "แมว", "ช้าง", "ม้า", "ไก่",
    "ปลา", "หมู", "เนื้อ", "ผัก", "ผลไม้", "กล้วย", "มะม่วง", "ส้ม",
    "แตงโม", "ข้าว", "น้ำ", "น้ำตาล", "กาแฟ", "นม", "ไข่", "อาหาร",
    // daily-life verbs
    "กิน", "ดื่ม", "นอน", "ตื่น", "เดิน", "วิ่ง", "นั่ง", "ยืน",
    "พูด", "ฟัง", "อ่าน", "เขียน", "ดู", "เห็น", "รู้", "คิด",
    "เข้าใจ", "จำ", "ลืม", "ชอบ", "เกลียด", "กลัว", "รัก", "เรียน",
    "ทำงาน", "ไป", "มา", "อยู่", "มี", "เป็น", "ได้", "ให้", "ทำ",
    "ใช้", "ซื้อ", "ขาย", "จ่าย", "เปิด", "ปิด", "เริ่ม", "จบ",
    "หยุด", "รอ", "หา", "เจอ", "พบ", "ช่วย", "ส่ง", "รับ", "เอา",
    "วาง", "ถาม", "ตอบ", "บอก", "เล่น", "ร้องเพลง", "เต้น", "ขับรถ",
    "ว่ายน้ำ", "ซักผ้า", "ทำอาหาร", "เที่ยว",
    // feelings / qualities
    "ดีใจ", "เสียใจ", "โกรธ", "เหนื่อย", "สบาย", "หิว", "อร่อย",
    "สวย", "หล่อ", "ใหญ่", "เล็ก", "สูง", "เตี้ย", "อ้วน", "ผอม",
    "ใหม่", "เก่า", "เร็ว", "ช้า", "แพง", "ถูก", "ง่าย", "ยาก",
    // transport / devices
    "รถ", "รถไฟ", "รถยนต์", "รถเมล์", "จักรยาน", "เรือ", "โทรศัพท์",
    "มือถือ",
    // numbers
    "หนึ่ง", "สอง", "สาม", "สี่", "ห้า", "หก", "เจ็ด", "แปด", "เก้า",
    "สิบ", "ร้อย", "พัน", "หมื่น", "แสน", "ล้าน",
    // colors
    "สี", "แดง", "เขียว", "เหลือง", "น้ำเงิน", "ขาว", "ดำ", "ชมพู",
    "ม่วง",
    // connectives / particles
    "และ", "มาก", "ไม่", "ที่", "ของ", "กับ", "แต่", "หรือ", "เพราะ",
    "ถ้า", "แล้ว", "ก็", "จะ", "ต้อง", "ควร", "อยาก", "กำลัง", "เคย",
    // question words / phrases
    "อะไร", "ที่ไหน", "เมื่อไหร่", "ทำไม", "อย่างไร", "ใคร",
    "เท่าไหร่", "สวัสดี", "ขอบคุณ", "ขอโทษ", "ไม่เป็นไร")

  /** The committed lexicon, all lengths. */
  val words: Seq[String] = core
}
