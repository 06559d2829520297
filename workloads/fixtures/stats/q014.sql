SELECT COUNT(*) FROM users as u, posts as p WHERE p.OwnerUserId = u.Id AND u.Views<=304 AND p.PostTypeId>=3 AND p.Score>=3 AND p.AnswerCount>=0 AND p.CommentCount<=17 AND p.FavoriteCount>=21;
