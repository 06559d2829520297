SELECT COUNT(*) FROM posts as p, postHistory as ph WHERE ph.PostId = p.Id AND p.PostTypeId>=3 AND p.ViewCount<=6556 AND p.AnswerCount=4 AND p.FavoriteCount>=21 AND ph.PostHistoryTypeId>=10;
