package graft.ops

/** Round-19 fifth growth band (442 words): livestream e-commerce &
  * online shopping, personal banking, home renovation & hand tools,
  * beauty/cosmetics/skincare, pets & veterinary care, wedding/funeral
  * customs, travel/visa/airport flow, tax & bookkeeping, driving
  * school & traffic rules, fitness/gym, household appliances,
  * community/property management, mobile payment, gaming/esports,
  * short-video creator economy, stationery, gardening, weather band 3,
  * chengyu bands 13-16 (time/nature, speech/argument, learning,
  * emotion idioms), and workplace colloquialisms — same
  * public-frequency-list discipline (HSK bands, jieba/SUBTLEX-CH high
  * bands; words re-listed from knowledge), curator-reviewed and
  * dedup-filtered against bands 1-15 at generation; own object for
  * the JVM clinit size limit.
  */
private[ops] object ZhLexiconBand16 {
  val words: Seq[String] = Seq(
    // livestream e-commerce / online shopping
    "带货", "凑单", "比价", "甩卖", "种草", "拔草", "测评", "开箱",
    "晒单", "中评", "运费险", "拆封", "催单", "客服", "售后",
    // personal banking
    "储蓄卡", "网银", "到账", "流水", "对账单", "定期", "活期", "额度",
    "分期", "还款日", "逾期", "罚息", "冻结", "销户", "开户", "开户行",
    "自助机", "取现", "存现", "整存", "挂失补卡",
    // home renovation / hand tools
    "瓷砖", "乳胶漆", "腻子", "防水层", "龙骨", "踢脚线", "橱柜", "玄关",
    "飘窗", "水电改造", "开荒保洁", "甲醛", "工期", "监理", "包工头", "梯子",
    "膨胀螺栓", "角磨机", "玻璃胶", "发泡胶", "墙纸", "五金件", "插座面板", "开关盒",
    // beauty / cosmetics / skincare
    "护肤品", "洁面乳", "面霜", "防晒霜", "粉底液", "散粉", "唇釉", "化妆棉",
    "黑头", "毛孔", "角质", "补水", "敏感肌", "油皮", "干皮", "混合皮",
    "卷发棒", "美甲", "修眉", "纹眉", "脱毛", "美睫",
    // pets / veterinary
    "宠物医院", "领养", "流浪猫", "流浪狗", "狗牌", "寄养", "宠物美容", "剪指甲",
    "掉毛", "换毛", "磨爪", "猫抓板", "逗猫棒", "遛狗", "拆家", "护食",
    "发情期", "疫苗本", "芯片植入", "猫传腹", "犬瘟",
    // wedding / funeral customs
    "聘礼", "婚纱照", "喜酒", "金婚", "银婚", "钻石婚", "悼词", "遗像",
    "火化", "骨灰盒", "墓地", "披麻戴孝", "头七", "守孝",
    // travel / visa / airport flow
    "免签", "落地签", "过境签", "候机厅", "摆渡车", "红眼航班", "改签", "退票",
    "接机", "送机", "跟团游", "打卡地", "索道", "观景台", "土特产",
    // tax / bookkeeping
    "纳税人", "起征点", "专项扣除", "补税", "报税", "开票", "电子发票", "纸质发票",
    "发票抬头", "报销单", "做账", "借方", "贷方", "总账", "明细账", "摊销",
    "折旧", "坏账", "应收账款", "应付账款", "税务局", "完税证明",
    // driving school / traffic rules
    "驾校", "教练车", "科目一", "科目二", "科目三", "科目四", "倒车入库", "侧方停车",
    "坡道起步", "超车道", "应急车道", "匝道", "并线", "跟车", "车距", "限速",
    "电子眼", "测速", "酒驾", "醉驾", "疲劳驾驶", "礼让行人", "远光灯", "近光灯",
    "双闪", "挡位", "手动挡", "自动挡", "后视镜", "安全气囊", "补胎", "爆胎",
    "洗车", "代驾", "陪练", "实习期",
    // fitness / gym
    "器械区", "壶铃", "卷腹", "体脂率", "基础代谢", "蛋白粉", "体测", "私教课",
    "月卡", "年卡", "次卡",
    // chengyu band 13: time / nature idioms
    "岁月如梭", "电光石火", "海枯石烂", "地老天荒", "和风细雨", "春风化雨", "雨后春笋", "滴水成冰",
    "波澜壮阔", "崇山峻岭", "绿树成荫",
    // chengyu band 14: speech / argument idioms
    "娓娓道来", "畅所欲言", "各抒己见", "众说纷纭", "莫衷一是", "心照不宣", "颠倒黑白", "混淆是非",
    "无言以对", "哑口无言", "一针见血", "拐弯抹角", "言外之意", "弦外之音", "话里有话", "一言为定",
    // workplace colloquialisms
    "加班费", "调休", "年假", "病假", "事假", "产假", "陪产假", "婚假",
    "丧假", "试用期", "背调", "猎头", "内推", "赔偿金", "竞业协议", "五险一金",
    "工资条", "绩效奖金", "十三薪", "股权激励", "团建", "例会", "周报", "日报",
    "晨会", "复盘", "对齐", "拉通", "赋能", "闭环", "抓手", "颗粒度",
    // household appliances band 2
    "烘干机", "电饼铛", "养生壶", "电热毯", "暖风机", "浴霸", "新风机", "蒸烤箱",
    "除螨仪", "酸奶机", "面包机", "电压力锅", "电炖锅", "恒温壶", "足浴盆", "按摩椅",
    "跑步垫",
    // community / property management
    "业主群", "业委会", "门禁卡", "单元门", "地下车库", "公摊", "得房率", "绿化率",
    "容积率", "梯户比", "入住率", "停车位", "车位费", "装修押金", "快递架", "充电棚",
    "监控探头", "保安亭", "护栏", "健身角", "步道",
    // mobile payment / digital life
    "收款码", "付款码", "免密支付", "指纹支付", "刷脸支付", "到账提醒", "账单分期", "余额提现",
    "实名认证", "绑卡", "解绑", "换绑", "扫码点餐", "电子会员", "积分兑换", "签到领券",
    "拼手气", "口令红包", "转赠", "代付",
    // gaming / esports
    "开黑", "上分", "掉分", "排位赛", "匹配机制", "氪金", "白嫖", "血条",
    "蓝条", "走位", "补刀", "打野", "中单", "上单", "辅助位", "射手位",
    "野怪", "兵线", "防御塔", "水晶", "闪现", "大招", "平砍", "暴击",
    "吸血", "护甲", "魔抗", "出装", "铭文", "王者局", "青铜局", "五杀",
    "超神", "团灭", "逆风局", "顺风局",
    // short video / creator economy
    "恰饭", "二创", "封面图", "完播率", "推荐页", "同城页", "直播带货", "合拍",
    "绿幕", "提词器", "补光灯", "麦克风架", "运营号", "涨粉秘籍", "限流", "实锤",
    "反转", "热度", "出圈", "塌房", "营业",
    // stationery / school supplies
    "中性笔", "橡皮擦", "修正带", "荧光笔", "燕尾夹", "答题卡", "涂卡笔", "笔芯",
    "墨囊", "钢笔尖", "直尺", "三角板", "量角器", "圆规", "削笔刀", "卷笔刀",
    "文具盒", "书皮", "错题本", "单词本", "练习册", "试卷袋",
    // gardening / houseplants
    "花盆", "花肥", "营养土", "扦插", "喷壶", "多肉", "绿萝", "吊兰",
    "换盆", "徒长", "烂根", "黄叶", "缓苗", "控水", "晒伤", "遮阴",
    "生根粉", "腐叶土", "珍珠岩", "蛭石", "排水孔", "托盘",
    // weather / disaster band 3
    "桑拿天", "震级", "避难所", "堰塞湖", "洪峰", "预警信号", "停课通知",
    // chengyu band 15: learning / effort idioms
    "循序渐进", "勤能补拙", "死记硬背", "博采众长", "崭露头角", "大器晚成", "厚积薄发",
    // chengyu band 16: emotion / state idioms
    "乐不思蜀", "如释重负", "惊魂未定", "惴惴不安", "心乱如麻", "不知所措", "深恶痛绝", "恨之入骨",
    "义愤填膺")
}
