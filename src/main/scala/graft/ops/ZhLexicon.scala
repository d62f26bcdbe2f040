package graft.ops

/** Committed zh frequency lexicon — the data table behind the
  * `cjk-dict` FMM word grain (same committed-constant pattern as
  * [[PublicSuffixes.rules]] / [[Bpe.merges]] /
  * [[QualityClassifierWeights.table]]: one Scala constant rendered
  * identically into both engine dialects, so the DuckDB oracle
  * replays the exact segmentation).
  *
  * Forward maximum match (FMM) is the classical dictionary
  * segmentation rule: at each position take the LONGEST lexicon word
  * starting there (lengths [[maxLen]]..2), else fall back to the
  * `cjk-auto` codepoint grain for in-block characters (the honest IR
  * fallback the engine has shipped since round 11) and to maximal
  * non-space runs for everything else. Greedy longest-match is
  * deterministic — no frequencies are consulted at match time, so the
  * lexicon is a plain word SET; the frequency ordering only decided
  * what made the cut.
  *
  * The word list is a knowledge-bounded rendering of the high-
  * frequency core shared by the public zh frequency lists (jieba's
  * dict.txt, HSK vocabulary bands, SUBTLEX-CH — all public data;
  * words re-listed from knowledge, not copied files). Like the PSL
  * table, the MECHANISM is sized for the full ~350k-entry production
  * lexicon (per-length hash probes and per-length SQL `IN` ladders —
  * extending is appending lines here and both dialects pick them up);
  * the committed core keeps the repo self-contained with no egress.
  *
  * INVARIANTS (object-init enforced): every word is 2..[[maxLen]]
  * codepoints, all characters inside [[graft.functions.GopherOps
  * .cjkRanges]] (a lexicon word may never swallow a run-token
  * boundary), no duplicates, no spaces.
  */
object ZhLexicon extends FmmLexicon {

  /** Longest lexicon word length, in codepoints. The DuckDB CASE
    * ladder unrolls to exactly this depth (the PSL-resolver trick).
    */
  val maxLen: Int = 4

  private val twoChar: Seq[String] = Seq(
    // pronouns / people
    "我们", "你们", "他们", "她们", "人们", "大家", "别人", "自己",
    "朋友", "同学", "同事", "父母", "爸爸", "妈妈", "哥哥", "姐姐",
    "弟弟", "妹妹", "儿子", "女儿", "孩子", "先生", "女士", "小姐",
    "老师", "学生", "医生", "护士", "警察", "司机", "工人", "农民",
    // places / institutions
    "中国", "美国", "英国", "法国", "德国", "日本", "韩国", "印度",
    "北京", "上海", "广州", "深圳", "香港", "台湾", "世界", "国家",
    "城市", "农村", "地方", "学校", "大学", "中学", "小学", "医院",
    "中文", "英文", "汉语", "英语", "语言", "文字", "词语", "句子",
    "公司", "工厂", "银行", "商店", "市场", "公园", "广场", "餐厅",
    "饭店", "宾馆", "机场", "车站", "街道", "马路", "房子", "房间",
    "厨房", "客厅", "卧室", "花园", "附近", "中间", "旁边", "外面",
    "里面", "上面", "下面", "前面", "后面", "左边", "右边",
    // society / abstractions
    "政府", "人民", "社会", "经济", "文化", "历史", "地理", "科学",
    "技术", "教育", "艺术", "音乐", "电影", "电视", "新闻", "报纸",
    "杂志", "网络", "信息", "数据", "系统", "项目", "计划", "目标",
    "结果", "原因", "条件", "环境", "空气", "问题", "办法", "方法",
    "方面", "情况", "关系", "影响", "变化", "发展", "研究", "管理",
    "服务", "产品", "质量", "价格", "生产", "贸易", "政策", "法律",
    "权利", "责任", "安全", "健康", "医疗", "保险", "工资", "收入",
    // time
    "时间", "时候", "今天", "明天", "昨天", "现在", "以前", "以后",
    "将来", "早上", "上午", "中午", "下午", "晚上", "星期", "月份",
    "春天", "夏天", "秋天", "冬天", "天气", "太阳", "月亮", "星星",
    "生日", "节日", "春节", "国庆", "周末", "假期", "小时", "分钟",
    // daily life / objects
    "东西", "事情", "生活", "工作", "学习", "休息", "运动", "锻炼",
    "旅游", "购物", "做饭", "吃饭", "喝水", "睡觉", "起床", "上班",
    "下班", "上课", "下课", "考试", "毕业", "结婚", "电脑", "手机",
    "电话", "汽车", "火车", "飞机", "地铁", "衣服", "裤子", "鞋子",
    "帽子", "桌子", "椅子", "沙发", "窗户", "水果", "苹果", "香蕉",
    "西瓜", "蔬菜", "米饭", "面条", "饺子", "包子", "牛奶", "咖啡",
    "啤酒", "茶叶", "钱包", "钥匙", "行李", "礼物", "照片", "书包",
    // verbs / mental
    "知道", "认识", "了解", "理解", "明白", "觉得", "认为", "相信",
    "希望", "需要", "应该", "可以", "可能", "必须", "愿意", "喜欢",
    "讨厌", "热爱", "关心", "担心", "高兴", "快乐", "幸福", "难过",
    "生气", "着急", "害怕", "奇怪", "有趣", "无聊", "开始", "结束",
    "继续", "停止", "进行", "完成", "成功", "失败", "努力", "帮助",
    "支持", "提供", "使用", "选择", "决定", "参加", "离开", "回来",
    "出去", "进入", "成为", "发现", "感觉", "记得", "忘记", "告诉",
    "回答", "讨论", "交流", "合作", "竞争", "介绍", "解决", "提高",
    "降低", "增加", "减少", "改变", "练习", "准备", "检查", "注意",
    // adjectives / adverbs / connectives
    "容易", "困难", "简单", "复杂", "重要", "主要", "基本", "一般",
    "特别", "非常", "十分", "比较", "更加", "最近", "已经", "还是",
    "但是", "因为", "所以", "如果", "虽然", "而且", "或者", "然后",
    "当然", "一定", "大概", "认真", "仔细", "干净", "漂亮", "美丽",
    "好看", "好吃", "便宜", "一起", "一样", "一些", "这个", "那个",
    "这些", "那些", "什么", "怎么", "多少", "几个", "每天", "马上")

  private val threeChar: Seq[String] = Seq(
    "普通话", "图书馆", "办公室", "计算机", "互联网", "电视机",
    "洗衣机", "电冰箱", "自行车", "出租车", "火车站", "飞机场",
    "大学生", "中学生", "小学生", "研究生", "外国人", "中国人",
    "美国人", "服务员", "售货员", "运动员", "科学家", "艺术家",
    "音乐家", "工程师", "程序员", "设计师", "老百姓", "星期天",
    "星期一", "星期二", "星期三", "星期四", "星期五", "星期六",
    "没关系", "对不起", "为什么", "不客气", "打电话", "差不多",
    "越来越", "不得不", "来不及", "舍不得", "有意思", "小时候")

  private val fourChar: Seq[String] = Seq(
    "公共汽车", "电子邮件", "人工智能", "机器学习", "深度学习",
    "神经网络", "自然语言", "社会主义", "资本主义", "改革开放",
    "经济发展", "科学技术", "国际关系", "环境保护", "交通工具",
    "百货商店", "社交媒体", "移动支付", "高速公路", "万里长城",
    "一心一意", "四面八方", "五颜六色", "乱七八糟", "马马虎虎",
    "不好意思", "自由自在", "全心全意", "各种各样", "日新月异")

  /** The committed lexicon, all lengths. */
  val words: Seq[String] = twoChar ++ threeChar ++ fourChar
}
